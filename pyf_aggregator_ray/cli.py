"""CLI job entry points (mirror of the reference's ``pyfa`` CLI modes:
full fetch ``pyfa pypi -f``, incremental, enrichment, maintenance —
``/root/reference/src/pyf/aggregator/cli.py:84-117``).

Usage:
    python -m pyf_aggregator_ray.cli build  --sf-dir DIR --index-root DIR [--resumable]
    python -m pyf_aggregator_ray.cli query  --index-root DIR --query "merge sort" [-k 10]
    python -m pyf_aggregator_ray.cli queryset --index-root DIR
    python -m pyf_aggregator_ray.cli incremental --index-root DIR --sf-dir DIR
    python -m pyf_aggregator_ray.cli gc     --index-root DIR [--keep 2]

Owns its Ray session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _confirm_delete_old(
    keep_old: bool, force: bool, old_version: str, ask=input
) -> bool:
    """The reference recreate CLI's deletion decision
    (``typesense_util.py:446-462``): --keep-old never deletes and never
    asks; --force deletes without asking; otherwise prompt with default
    YES — any answer except "n"/"N" deletes."""
    if keep_old:
        return False
    if force:
        return True
    try:
        confirm = ask(f"Delete old index version {old_version}? (Y/n): ")
    except EOFError:
        # non-interactive caller (script/cron, no stdin): take the
        # documented default Yes — the pre-round-5 behavior of plain
        # `recreate` (delete without prompting) is preserved for
        # automation; an interactive "n" is the only way to keep
        return True
    return confirm.strip().lower() != "n"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pyf_aggregator_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full index build (versioned + alias swap)")
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--index-root", required=True)
    b.add_argument("--resumable", action="store_true")
    b.add_argument("--num-partitions", type=int, default=8)

    q = sub.add_parser("query", help="one BM25 query against the live index")
    q.add_argument("--index-root", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)

    qs = sub.add_parser("queryset", help="run the reference query set")
    qs.add_argument("--index-root", required=True)

    se = sub.add_parser(
        "search",
        help="one composed search through the unified facade — the "
        "reference's full parameter dict (q / filter_by / group_by / "
        "num_typos / sort_by / per_page+page / phrase / vector hybrid / "
        "highlights) as flags",
    )
    se.add_argument("--sf-dir", required=True)
    se.add_argument("--query", required=True)
    se.add_argument("-k", type=int, default=10)
    se.add_argument("--page", type=int, default=1)
    se.add_argument("--filter-by", help="field:=value [&& field:=value ...]")
    se.add_argument("--group-by", action="store_true")
    se.add_argument("--num-typos", type=int, default=0, choices=(0, 1, 2))
    se.add_argument("--sort-by", default="score", choices=("score", "dl"))
    se.add_argument("--phrase", action="store_true")
    se.add_argument("--snippets", action="store_true")
    se.add_argument("--query-vec-id", type=int)

    inc = sub.add_parser("incremental", help="merge new docs into the live index")
    inc.add_argument("--index-root", required=True)
    inc.add_argument("--sf-dir", required=True)

    g = sub.add_parser("gc", help="delete old index versions")
    g.add_argument("--index-root", required=True)
    g.add_argument("--keep", type=int, default=2)

    sh = sub.add_parser(
        "show", help="live index info: version, stats, manifest lineage"
    )
    sh.add_argument("--index-root", required=True)

    cu = sub.add_parser(
        "curate",
        help="training-data curation: exact+near dedup, quality floor, "
        "language filter -> curated parquet",
    )
    cu.add_argument("--sf-dir", required=True)
    cu.add_argument("--out-dir", required=True)

    ex = sub.add_parser("export", help="K5: doc table -> JSONL export")
    ex.add_argument("--index-root", required=True)
    ex.add_argument("--out-dir", required=True)

    mg = sub.add_parser(
        "migrate",
        help="K5: copy the live index version into another root as its "
        "next version + alias switch (reference typesense_util migrate)",
    )
    mg.add_argument("--from-root", required=True)
    mg.add_argument("--to-root", required=True)

    rc = sub.add_parser(
        "recreate",
        help="K6: zero-downtime in-place recreation — re-export the live "
        "version into a fresh one, verify, alias-switch (reference "
        "typesense_util recreate_collection)",
    )
    rc.add_argument("--index-root", required=True)
    rc.add_argument(
        "--keep-old",
        action="store_true",
        help="keep the old version dir for manual deletion (default deletes)",
    )
    rc.add_argument(
        "--force",
        action="store_true",
        help="delete the old version without the confirmation prompt "
        "(reference typesense_util --force)",
    )

    dl = sub.add_parser(
        "delete-version",
        help="delete one retired index version directory (reference "
        "typesense_util --delete-collection: y/N confirmation, default "
        "No; refuses the live alias target)",
    )
    dl.add_argument("--index-root", required=True)
    dl.add_argument("--version-dir", required=True)
    dl.add_argument(
        "--force", action="store_true", help="skip the confirmation prompt"
    )

    pr = sub.add_parser("profiles", help="list/validate YAML profiles")
    pr.add_argument("--profiles-path")
    pr.add_argument("--profile", help="show one profile (validated)")

    pk = sub.add_parser(
        "packages",
        help="profile-driven package pipeline: chain + classifier predicate "
        "+ npm validity, auto-named target (reference `pyfa pypi -p`)",
    )
    pk.add_argument("--profile")
    pk.add_argument("--target")
    pk.add_argument("--profiles-path")
    pk.add_argument(
        "--report-dir",
        help="side-write the incremental enrichment problems report "
        "(github_problems.json/.md) for this run",
    )

    args = p.parse_args(argv)

    if args.cmd == "profiles":  # no Ray needed
        from .state.profiles import ProfileManager

        pm = ProfileManager(args.profiles_path)
        if args.profile:
            prof = pm.get(args.profile)
            print(json.dumps({
                "key": prof.key, "name": prof.name, "target": prof.target,
                "classifiers": prof.classifiers,
                "npm": {"keywords": prof.npm_keywords, "scopes": prof.npm_scopes},
            }))
        else:
            print(json.dumps({"profiles": pm.list_profiles()}))
        return 0

    if args.cmd == "gc":  # no Ray needed
        from .state import manifest as mf

        removed = mf.gc_old_versions(args.index_root, keep=args.keep)
        print(json.dumps({"removed_versions": removed}))
        return 0

    if args.cmd == "delete-version":  # no Ray needed
        # reference typesense_util.py:485-505: destructive delete
        # confirms with default NO (only a literal y/Y proceeds);
        # --force skips. The live-alias guard lives in
        # delete_index_version itself.
        from .pipelines.maintenance import delete_index_version

        if not args.force:
            confirm = input(
                f"Are you sure you want to delete index version "
                f"'{args.version_dir}'? (y/N): "
            )
            if confirm.strip().lower() != "y":
                print(json.dumps({"deleted": False, "cancelled": True}))
                return 0
        removed = delete_index_version(args.index_root, args.version_dir)
        print(json.dumps({"deleted": bool(removed), "cancelled": False}))
        return 0

    if args.cmd == "show":  # no Ray needed
        from .state import manifest as mf

        live = mf.read_alias(args.index_root)
        if not live:
            print(json.dumps({"live": None, "versions": mf.list_versions(args.index_root)}))
            return 0
        manifest = mf.read_manifest(live) or {}
        try:
            stats = mf.read_stats(live)
        except FileNotFoundError:
            stats = None
        print(json.dumps({
            "live": live,
            "versions": mf.list_versions(args.index_root),
            "stats": stats,
            "kind": manifest.get("kind", "full"),
            "config": manifest.get("config"),
        }, default=str))
        return 0

    _ensure_ray()
    import ray

    try:
        if args.cmd == "build":
            from .pipelines.build_index import build_index

            manifest = build_index(
                args.sf_dir,
                args.index_root,
                resumable=args.resumable,
                num_partitions=args.num_partitions,
            )
            print(json.dumps({"stats": manifest["stats"], "metrics": manifest["metrics"]}, default=str))
        elif args.cmd == "query":
            from .pipelines.query import IndexReader

            reader = IndexReader(args.index_root)
            rows = reader.score(args.query, args.k)
            from .functions.rounding import round6

            # round6 (floor formula), NOT Python round: keeps single-query
            # CLI output digit-identical with queryset/ScorerStage/oracles
            print(json.dumps([{"rank": r, "doc_id": d, "score": round6(s)} for r, d, s in rows]))
        elif args.cmd == "queryset":
            from .pipelines.query import run_query_set

            df = run_query_set(args.index_root).to_pandas()
            print(df.to_json(orient="records"))
        elif args.cmd == "search":
            from .pipelines.searchapi import search

            tbl = search(
                args.sf_dir,
                args.query,
                k=args.k,
                page=args.page,
                filter_by=args.filter_by,
                group_by=args.group_by,
                num_typos=args.num_typos,
                sort_by=args.sort_by,
                phrase=args.phrase,
                query_vec_id=args.query_vec_id,
                include_snippets=args.snippets,
            )
            print(tbl.to_pandas().to_json(orient="records"))
        elif args.cmd == "incremental":
            from .pipelines.incremental import incremental_update
            from .sources.corpus import read_corpus

            manifest = incremental_update(args.index_root, read_corpus(args.sf_dir))
            print(json.dumps({"stats": manifest["stats"]}, default=str))
        elif args.cmd == "curate":
            from .pipelines.curation import curate_and_write

            counts = curate_and_write(args.sf_dir, args.out_dir)
            print(json.dumps({"status_counts": counts, "out_dir": args.out_dir}))
        elif args.cmd == "export":
            from .pipelines.maintenance import export_docs_jsonl

            n = export_docs_jsonl(args.index_root, args.out_dir)
            print(json.dumps({"exported_rows": n, "out_dir": args.out_dir}))
        elif args.cmd == "migrate":
            from .pipelines.maintenance import migrate_index

            manifest = migrate_index(args.from_root, args.to_root)
            print(json.dumps({"version": manifest["version"],
                              "kind": manifest["kind"]}))
        elif args.cmd == "recreate":
            # the reference CLI flow (typesense_util.py:446-462): migrate
            # first with delete_old=False, THEN decide deletion —
            # --force skips the prompt; the prompt's default is Yes
            # (anything but "n" deletes); --keep-old never asks
            from .pipelines.maintenance import (
                delete_index_version,
                recreate_index,
            )

            result = recreate_index(args.index_root, delete_old=False)
            deleted = _confirm_delete_old(
                args.keep_old, args.force, result["old_version"]
            )
            if deleted:
                delete_index_version(args.index_root, result["old_version"])
            result["deleted_old"] = deleted
            print(json.dumps(result))
        elif args.cmd == "packages":
            from .pipelines.packagepipe import profile_package_run

            print(json.dumps(profile_package_run(
                profile=args.profile,
                target=args.target,
                profiles_path=args.profiles_path,
                report_dir=args.report_dir,
            )))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
