"""SIGKILL/resume byte-identity at scale on the COMPACTED manifest
layout (VERDICT r04 #7; extends the round-2 protocol in BASELINE.md).

Protocol:
  1. clean reference run of the flagship extraction at --sf
  2. second run into a fresh out dir, SIGKILLed (-9) once ~--kill-frac
     of its partitions have committed manifests
  3. ``compact_manifests`` consolidates the survivor's loose JSONs into
     an epoch parquet ledger (the steady-state 100-TB layout) — the
     resume below therefore reads committed state from the LEDGER path,
     not the loose-file path the round-2 test exercised
  4. a fresh process resumes the killed dir: must skip exactly the
     committed partitions (before any parse work) and finish the rest
  5. md5 over the sorted (url \\0 text \\1) stream of both output dirs
     must be identical

Usage: python tools/validate_kill_resume.py [--sf 1.0] [--kill-frac 0.25]
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def corpus_md5(out_dir: str) -> str:
    """md5 of the url-sorted (url \\0 text \\1) stream over every
    extracted partition — the round-2 identity fingerprint, vectorized
    (Arrow join + values-buffer hashing, no per-row Python)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out_dir, "extracted"),
                      columns=["url", "text"])
    st = pa.large_string()
    # large_string BEFORE the sort: take() on >2 GB of 32-bit-offset
    # string chunks overflows while concatenating
    t = t.cast(pa.schema([("url", st), ("text", st)]))
    t = t.sort_by("url")
    joined = pc.binary_join_element_wise(
        t.column("url").cast(st), t.column("text").cast(st),
        pa.scalar("\0", st))
    joined = pc.binary_join_element_wise(
        joined, pa.scalar("", st), pa.scalar("\1", st))
    h = hashlib.md5()
    arrs = joined.chunks if isinstance(joined, pa.ChunkedArray) else [joined]
    for arr in arrs:
        if len(arr) == 0:
            continue
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset: arr.offset + len(arr) + 1]
        h.update(memoryview(arr.buffers()[2])[int(offs[0]):int(offs[-1])])
    return h.hexdigest()


def run_job(sf: float, out: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "run_extract_job.py"),
         "--sf", str(sf), "--out", out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO, start_new_session=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--kill-frac", type=float, default=0.25)
    ap.add_argument("--workdir", default="/tmp/kill_resume_r5")
    args = ap.parse_args()

    from raydoc.state.manifest import (committed_partitions,
                                       compact_manifests, load_manifests)

    shutil.rmtree(args.workdir, ignore_errors=True)
    ref_out = os.path.join(args.workdir, "ref")
    kill_out = os.path.join(args.workdir, "killed")

    # 1. clean reference run (also generates/caches the corpus)
    t0 = time.time()
    p = run_job(args.sf, ref_out)
    p.wait()
    assert p.returncode == 0, "reference run failed"
    ref_parts = len(committed_partitions(ref_out))
    print(f"reference run: {ref_parts} partitions in "
          f"{time.time()-t0:.1f}s")

    # 2. SIGKILL the second run mid-flight
    target = max(2, int(ref_parts * args.kill_frac))
    p = run_job(args.sf, kill_out)
    while True:
        if p.poll() is not None:
            raise SystemExit("job finished before the kill threshold — "
                             "lower --kill-frac")
        if len(committed_partitions(kill_out)) >= target:
            break
        time.sleep(1.0)
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()
    time.sleep(2.0)  # let any orphaned ray workers die with the session
    committed_at_kill = committed_partitions(kill_out)
    print(f"SIGKILLed with {len(committed_at_kill)}/{ref_parts} "
          f"partitions committed")

    # 3. compact: committed state moves into the parquet ledger
    ledger = compact_manifests(kill_out)
    assert ledger, "nothing compacted"
    loose = glob.glob(os.path.join(kill_out, "_manifest", "**", "*.json"),
                      recursive=True)
    assert not loose, f"loose manifests survived compaction: {loose[:3]}"
    assert committed_partitions(kill_out) == committed_at_kill
    print(f"compacted -> {os.path.basename(ledger)}; ledger-only resume "
          f"state verified")

    # 4. resume in a fresh process
    t0 = time.time()
    p = run_job(args.sf, kill_out)
    out, _ = p.communicate()
    assert p.returncode == 0, "resume run failed"
    import json as _json

    summary = _json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1])
    assert summary["n_parts_skipped_resume"] == len(committed_at_kill), \
        (summary["n_parts_skipped_resume"], len(committed_at_kill))
    assert summary["n_parts_committed"] == ref_parts
    print(f"resume: skipped {summary['n_parts_skipped_resume']}, wrote "
          f"{summary['n_parts_written']} in {time.time()-t0:.1f}s")

    # re-committed partitions after compaction write fresh loose JSONs
    # that override ledger rows on load
    rows = load_manifests(kill_out)
    assert len(rows) == ref_parts

    # 5. byte identity
    m_ref, m_kill = corpus_md5(ref_out), corpus_md5(kill_out)
    print(f"md5 ref={m_ref} resumed={m_kill}")
    assert m_ref == m_kill, "BYTE IDENTITY FAILED"
    print("KILL/RESUME OK (compacted-ledger layout, sf=%s)" % args.sf)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
