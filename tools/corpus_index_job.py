"""Persisted corpus-index lifecycle as a `ray job submit` driver — the
rolling-crawl dedup entry point (ops/incremental.py).

On a real cluster the index lives on shared storage and each crawl
batch runs one job:

    ray job submit --working-dir . -- \
        python tools/corpus_index_job.py seed \
        --docs s3://bucket/batch0/ --index s3://bucket/corpus_idx/

    ray job submit --working-dir . -- \
        python tools/corpus_index_job.py dedup \
        --docs s3://bucket/batch1/ --index s3://bucket/corpus_idx/ \
        --out s3://bucket/batch1_kept/ --update-index

Subcommands:

  seed    build the near-dup (and optionally exact) index from a doc table
  append  add a doc table's signatures to an existing index
  dedup   drop new docs near-duplicating the indexed corpus; write the
          kept rows as Parquet; --update-index appends the survivors so
          the next batch probes corpus + this batch
  compact rewrite accumulated per-append files into ~2M-row files
          (crash-safe by idempotence; consumers tolerate the
          duplicate-row window; covers sem_members bucket dirs)
  status  print the index meta + per-component file/row counts

  seed-semantic / append-semantic / dedup-semantic: the same lifecycle
  for the SEMANTIC component (k-means centroids + cell-tagged member
  embeddings; incremental SemDeDup of each new embedding batch against
  the frozen persisted centroids, cell-pruned probe)

Each invocation prints ONE JSON line. This script OWNS its Ray session
(library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_docs(path: str, text_col: str, id_col: str):
    import ray.data as rd

    return rd.read_parquet(path, columns=[id_col, text_col])


def _component_stats(index_dir: str) -> dict:
    import pyarrow.parquet as pq

    out = {}
    for comp in ("sigs", "bands", "exact", "sem_centroids"):
        d = os.path.join(index_dir, comp)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        out[comp] = {"files": len(files), "rows": rows}
    mdir = os.path.join(index_dir, "sem_members")
    if os.path.isdir(mdir):
        files = glob.glob(os.path.join(mdir, "bucket=*", "*.parquet"))
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        out["sem_members"] = {"files": len(files), "rows": rows,
                              "buckets": len(glob.glob(
                                  os.path.join(mdir, "bucket=*")))}
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def _common(p, docs=True):
        p.add_argument("--index", required=True, help="index directory")
        if docs:
            p.add_argument("--docs", required=True,
                           help="doc table parquet file/dir")
            p.add_argument("--text-col", default="text")
            p.add_argument("--id-col", default="doc_id")

    p_seed = sub.add_parser("seed")
    _common(p_seed)
    p_seed.add_argument("--num-perm", type=int, default=128)
    p_seed.add_argument("--bands", type=int, default=32)
    p_seed.add_argument("--shingle-k", type=int, default=5)
    p_seed.add_argument("--with-exact", action="store_true",
                        help="also seed the md5 exact-dup component")

    p_app = sub.add_parser("append")
    _common(p_app)

    p_dedup = sub.add_parser("dedup")
    _common(p_dedup)
    p_dedup.add_argument("--out", required=True,
                         help="kept-rows output parquet dir")
    p_dedup.add_argument("--threshold", type=float, default=0.7)
    p_dedup.add_argument("--max-bucket-docs", type=int, default=None)
    p_dedup.add_argument("--update-index", action="store_true")

    p_comp = sub.add_parser("compact")
    _common(p_comp, docs=False)
    p_comp.add_argument("--target-rows-per-file", type=int,
                        default=2_000_000)

    p_stat = sub.add_parser("status")
    _common(p_stat, docs=False)

    def _vec_common(p):
        p.add_argument("--index", required=True)
        p.add_argument("--vecs", required=True,
                       help="embedding table parquet file/dir")
        p.add_argument("--id-col", default="vec_id")
        p.add_argument("--emb-col", default="embedding")

    p_ssem = sub.add_parser("seed-semantic")
    _vec_common(p_ssem)
    p_ssem.add_argument("--init-ids", required=True,
                        help="comma-separated seed row ids (k = count)")
    p_ssem.add_argument("--n-updates", type=int, default=1)

    p_asem = sub.add_parser("append-semantic")
    _vec_common(p_asem)

    p_dsem = sub.add_parser("dedup-semantic")
    _vec_common(p_dsem)
    p_dsem.add_argument("--out", required=True)
    p_dsem.add_argument("--threshold", type=float, default=0.9)
    p_dsem.add_argument("--n-probe", type=int, default=1)
    p_dsem.add_argument("--update-index", action="store_true")

    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # `ray job submit` may have connected us
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raydoc.ops import incremental as inc

    t0 = time.perf_counter()
    result: dict = {"cmd": args.cmd, "index": args.index}

    if args.cmd == "seed":
        docs = _read_docs(args.docs, args.text_col, args.id_col)
        inc.write_neardup_index(
            docs, args.index, text_col=args.text_col, id_col=args.id_col,
            num_perm=args.num_perm, bands=args.bands,
            shingle_k=args.shingle_k)
        if args.with_exact:
            inc.write_exact_index(
                _read_docs(args.docs, args.text_col, args.id_col),
                args.index, text_col=args.text_col, id_col=args.id_col)
        result["meta"] = inc.read_index_meta(args.index)
    elif args.cmd == "append":
        docs = _read_docs(args.docs, args.text_col, args.id_col)
        inc.append_neardup_index(docs, args.index,
                                 text_col=args.text_col,
                                 id_col=args.id_col)
        if os.path.exists(os.path.join(args.index, "exact")):
            inc.append_exact_index(
                _read_docs(args.docs, args.text_col, args.id_col),
                args.index, text_col=args.text_col, id_col=args.id_col)
    elif args.cmd == "dedup":
        import ray.data as rd

        if glob.glob(os.path.join(args.out, "*.parquet")):
            print(json.dumps({"error": f"--out {args.out} already holds "
                              "parquet files; each batch needs a fresh "
                              "output dir (the read-back tally would "
                              "over-count otherwise)"}))
            return 1
        new = rd.read_parquet(args.docs)  # keep ALL columns for the output
        kept, pairs = inc.incremental_dedup(
            new, args.index, text_col=args.text_col, id_col=args.id_col,
            threshold=args.threshold, max_bucket_docs=args.max_bucket_docs,
            update_index=args.update_index)
        from raydoc.ops.relational import distinct_on

        n_victims = distinct_on(pairs.select_columns(["id_new"]), "id_new",
                                bucketed=True).count()
        kept.write_parquet(args.out)
        # column-pruned read-back of the WRITTEN output, not a
        # re-execution of the dedup lineage; an all-victims batch
        # writes no files at all -> 0 kept, not a crash
        n_kept = (rd.read_parquet(args.out, columns=[args.id_col]).count()
                  if glob.glob(os.path.join(args.out, "*.parquet"))
                  else 0)
        result.update({"out": args.out, "n_victims": n_victims,
                       "n_kept": n_kept,
                       "index_updated": bool(args.update_index)})
    elif args.cmd == "seed-semantic":
        import ray.data as rd

        vecs = rd.read_parquet(args.vecs,
                               columns=[args.id_col, args.emb_col])
        result["meta_semantic"] = inc.write_semantic_index(
            vecs, args.index,
            init_ids=[int(x) for x in args.init_ids.split(",")],
            id_col=args.id_col, emb_col=args.emb_col,
            n_updates=args.n_updates)
    elif args.cmd == "append-semantic":
        import ray.data as rd

        inc.append_semantic_index(
            rd.read_parquet(args.vecs,
                            columns=[args.id_col, args.emb_col]),
            args.index)
    elif args.cmd == "dedup-semantic":
        import ray.data as rd

        if glob.glob(os.path.join(args.out, "*.parquet")):
            print(json.dumps({"error": f"--out {args.out} already holds "
                              "parquet files; each batch needs a fresh "
                              "output dir"}))
            return 1
        new = rd.read_parquet(args.vecs)  # keep ALL columns
        kept, pairs = inc.incremental_semantic_dedup(
            new, args.index, threshold=args.threshold,
            n_probe=args.n_probe, update_index=args.update_index)
        from raydoc.ops.relational import distinct_on

        n_victims = distinct_on(pairs.select_columns(["id_new"]),
                                "id_new", bucketed=True).count()
        kept.write_parquet(args.out)
        n_kept = (rd.read_parquet(args.out,
                                  columns=[args.id_col]).count()
                  if glob.glob(os.path.join(args.out, "*.parquet"))
                  else 0)
        result.update({"out": args.out, "n_victims": n_victims,
                       "n_kept": n_kept,
                       "index_updated": bool(args.update_index)})
    elif args.cmd == "compact":
        result["report"] = {
            k: list(v) for k, v in inc.compact_index(
                args.index,
                target_rows_per_file=args.target_rows_per_file).items()}
    else:  # status
        if os.path.exists(os.path.join(args.index, "_meta.json")):
            result["meta"] = inc.read_index_meta(args.index)
        if os.path.exists(os.path.join(args.index, "_meta_exact.json")):
            result["meta_exact"] = inc.read_exact_meta(args.index)
        if os.path.exists(os.path.join(args.index,
                                       "_meta_semantic.json")):
            result["meta_semantic"] = inc.read_semantic_meta(args.index)
        result["components"] = _component_stats(args.index)

    result["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
