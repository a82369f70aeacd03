"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only has exact dedup on content
(drop_duplicates, /root/reference/agent/component/base.py:474,509); the
near-dup operators are the scale extensions a training-data pipeline
needs (SURVEY.md §2.5). All hashes come from raydoc.hashing (process-
independent); all pipelines follow the same shape:

    map_batches(signature)            # vectorized per-doc signatures
      -> flat band/bucket rows        # small rows, the only shuffled data
      -> groupby(bucket).map_groups   # candidate pairs within buckets
      -> distinct pair + estimate     # verified/estimated similarity

so the all-to-all exchange moves fixed-size signatures or bare
(id, bucket) rows, never document text. MinHash picks between two
physically different plans by input size (see minhash_lsh_pairs): a
single-pass sig-carrying plan for small inputs and a slim
candidate-verify plan whose bucket shuffle is bands x 16 B per doc
(int64 id + uint64 band key) at web scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydoc.hashing import md5_hex, stable_u64
from raydoc.ops.text import shingles

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_batch",
    "simhash_pairs",
    "ngram_jaccard",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "contamination_screen",
    "segment_dedup",
]

_MERSENNE = (1 << 61) - 1
_MAXU64 = np.uint64(0xFFFFFFFFFFFFFFFF)
# candidate-count ceilings for broadcasting verify payloads instead of
# co-partitioning them onto the pairs: sigs are num_perm x 8 B each,
# texts are KBs each, so texts flip to the attach path much earlier
_BROADCAST_CAP = 1_000_000
_TEXT_BROADCAST_CAP = 100_000


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int | None = None):
    """Keep one row per distinct text (minimum id survives) and count
    copies. Groups on md5(text) so the shuffle comparator is a fixed
    16-byte key even for megabyte documents.

    Output columns: all input columns of the surviving row + n_copies.

    The distinct-text key space is corpus-sized, so grouping BY the md5
    key would pay one Python ``map_groups`` call per distinct document
    (measured 4.6 s for 5k docs at sf0.1). Instead the md5 keys are
    hash-bucketed into ``num_partitions`` coarse groups and each
    bucket's block is deduped VECTORIZED: sort by (key, id), mark run
    starts by adjacent-key comparison, take first-of-run rows, run
    lengths = n_copies. One shuffle, one pass, P Python calls total.
    ``num_partitions`` defaults to a cpu-based count; at real scale
    pass ~total_bytes / 256 MB so a bucket fits a worker's heap.
    """
    from raydoc.ops.relational import _cpu_cap

    P = num_partitions or max(4, _cpu_cap())

    def _key(batch: pa.Table) -> pa.Table:
        keys = [md5_hex(t or "") for t in batch.column(text_col).to_pylist()]
        batch = batch.append_column("_dk", pa.array(keys, type=pa.string()))
        part = np.array([int(k[:8], 16) % P for k in keys], dtype=np.int64)
        return batch.append_column("_part", pa.array(part))

    def _dedupe_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # ADVICE r02: starts=[0] would mis-take
            return group.drop_columns(["_dk", "_part"]).append_column(
                "n_copies", pa.array([], pa.int64()))
        idx = pc.sort_indices(group, sort_keys=[("_dk", "ascending"),
                                                (id_col, "ascending")])
        t = group.take(idx)
        keys = t.column("_dk").combine_chunks()
        n = len(keys)
        starts = np.flatnonzero(
            np.concatenate(([True], np.asarray(
                pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
            ))))
        counts = np.diff(np.append(starts, n))
        out = t.take(pa.array(starts)).drop_columns(["_dk", "_part"])
        return out.append_column("n_copies", pa.array(counts, pa.int64()))

    from raydoc.ops.bucketing import _coalesce_typed

    return _coalesce_typed(
        ds.map_batches(_key, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_dedupe_bucket, batch_format="pyarrow")
    )


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


# per-process token-hash cache: web text's vocabulary is tiny next to
# its shingle count, so hashing each DISTINCT token once and combining
# k-grams with a vectorized polynomial removes ~90% of the per-doc
# blake2 calls (measured 2.1 ms -> ~0.5 ms per 800-token doc)
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1 << 20
# odd 64-bit weights for the k-gram polynomial (position-dependent so
# "a b" and "b a" hash differently); uint64 wraparound is the modulus
_GRAM_W = np.random.RandomState(17).randint(
    1, 1 << 62, size=64, dtype=np.uint64) | np.uint64(1)
# per-band salts: band keys are UINT64 (8 B in the LSH shuffle vs ~37 B
# for the old "<band>:<md5hex>" strings — the bucket exchange is the
# dedup family's one all-to-all, so its row width is the scale knob);
# the salt keeps band i and band j buckets from colliding
_BAND_SALT = np.random.RandomState(29).randint(
    0, 1 << 62, size=256, dtype=np.uint64)


def _band_keys(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """One uint64 bucket key per band: position-weighted polynomial of
    the band's signature slice (wraparound arithmetic) + a per-band
    salt. A cross-band collision only creates a candidate pair that the
    signature-estimate stage then rejects — correctness never depends
    on key uniqueness."""
    chunks = sig.reshape(bands, rows_per_band)
    return (chunks * _GRAM_W[None, :rows_per_band]).sum(axis=1) \
        + _BAND_SALT[:bands]


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = stable_u64(t)
            if len(cache) < _TOKEN_HASH_CACHE_MAX:
                cache[t] = h
        out[i] = h
    return out


def _batch_token_hashes(col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tokenize+hash for a WHOLE batch's text column:
    lowercase + whitespace-split via Arrow kernels, dictionary-encode
    the flat token stream, blake2-hash each DISTINCT token once
    (through the shared per-process cache), gather. Returns
    ``(th_flat, offsets)``: doc i's token hashes are
    ``th_flat[offsets[i]:offsets[i+1]]``.

    Token semantics == ``(text or "").lower().split()`` (runs of
    Unicode whitespace; boundary empties dropped; null -> no tokens),
    the list the scalar ``_doc_minhash`` path produces — one
    documented divergence: Arrow's utf8_lower maps U+0130 (Turkish
    dotted capital I) to a bare "i" where Python emits "i"+combining
    dot. That shifts ONE token hash inside the LSH *estimation* stage
    for docs containing that codepoint; the exact-string verify stages
    (ngram_jaccard, shingles) never use this path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lst = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.fill_null(col, "")))
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    flat = lst.flatten()
    if len(flat) == 0:
        return (np.empty(0, np.uint64),
                np.zeros(n + 1, dtype=np.int64))
    enc = pc.dictionary_encode(flat)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    cache = _TOKEN_HASH_CACHE
    vh = np.empty(len(vocab), dtype=np.uint64)
    empty_code = -1
    for i, tkn in enumerate(vocab):
        if tkn == "":
            empty_code = i
            vh[i] = 0
            continue
        h = cache.get(tkn)
        if h is None:
            h = stable_u64(tkn)
            if len(cache) < _TOKEN_HASH_CACHE_MAX:
                cache[tkn] = h
        vh[i] = h
    th_all = vh[idx]
    if empty_code >= 0:
        keep = idx != empty_code
        doc_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)[keep]
        th_all = th_all[keep]
        lengths = np.bincount(doc_ids, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return th_all, offsets


def _minhash_from_th(th: np.ndarray, a: np.ndarray, b: np.ndarray,
                     k: int) -> np.ndarray:
    """MinHash signature from a doc's precomputed token-hash array —
    the permutation/min half of ``_doc_minhash`` (see its docstring
    for the gram-hash design)."""
    if len(th) == 0:
        return np.full(len(a), _MAXU64, dtype=np.uint64)
    if len(th) <= k:
        gram = (th * _GRAM_W[: len(th)]).sum(keepdims=True)
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(th, k)  # (S, k) view, no copy
        gram = (win * _GRAM_W[None, :k]).sum(axis=1)
    vals = (a[:, None] * gram[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


_SIG_CHUNK_TOKENS = 1 << 16


def _batch_minhash(th_all: np.ndarray, offs: np.ndarray, a: np.ndarray,
                   b: np.ndarray, k: int) -> np.ndarray:
    """(n_docs, num_perm) uint64 signature matrix for a whole batch —
    byte-identical to per-doc ``_minhash_from_th`` (same k-gram
    polynomial, same wraparound permute arithmetic, same min), with the
    per-doc Python loop replaced by flat-gram arrays and
    ``np.minimum.reduceat`` at doc gram boundaries (r05; the per-doc
    permute/min cost ~150 µs/doc/core and was the last row loop in the
    near-dup path). Docs with no tokens get all-``_MAXU64`` rows, the
    empty-signature sentinel the scalar path emits.

    Work is chunked at doc boundaries to ~``_SIG_CHUNK_TOKENS`` tokens
    so every transient stays ~0.5 MB and the permute reuses ONE
    preallocated buffer — fresh multi-100MB allocations page-fault-storm
    under concurrency on this host class (see simhash_batch and
    bucketing.pair_cosine for the measurements)."""
    n = len(offs) - 1
    P = len(a)
    sig = np.full((n, P), _MAXU64, dtype=np.uint64)
    if n == 0 or len(th_all) == 0:
        return sig
    lens = np.diff(offs)
    # grams per doc: 0 if empty; one whole-text gram if 0 < L < k
    # (L == k's single sliding window equals the whole-text gram, so
    # it rides the sliding branch); else L - k + 1 sliding grams
    g = np.where(lens == 0, 0,
                 np.maximum(lens - (k - 1), 1)).astype(np.int64)
    chunk_tokens = max(_SIG_CHUNK_TOKENS, int(lens.max()))
    buf = None
    d0 = 0
    while d0 < n:
        d1 = int(np.searchsorted(offs, offs[d0] + chunk_tokens,
                                 side="right")) - 1
        d1 = max(d1, d0 + 1)
        t0, t1 = int(offs[d0]), int(offs[d1])
        th = th_all[t0:t1]
        T = t1 - t0
        nc = d1 - d0
        lens_c = lens[d0:d1]
        g_c = g[d0:d1]
        starts_tok = (offs[d0:d1] - t0).astype(np.int64)
        gram_offs = np.zeros(nc + 1, dtype=np.int64)
        np.cumsum(g_c, out=gram_offs[1:])
        total_g = int(gram_offs[-1])
        if total_g == 0:
            d0 = d1
            continue
        grams = np.empty(total_g, dtype=np.uint64)
        slot_doc = np.repeat(np.arange(nc, dtype=np.int64), g_c)
        long_slot = lens_c[slot_doc] >= k
        with np.errstate(over="ignore"):
            if T >= k and long_slot.any():
                # flat sliding-window polynomial: k shifted
                # multiply-adds instead of an (S, k) window matrix
                poly = th[: T - k + 1] * _GRAM_W[0]
                for j in range(1, k):
                    poly = poly + th[j: T - k + 1 + j] * _GRAM_W[j]
                # window start positions valid for their containing doc
                doc_of = np.repeat(np.arange(nc, dtype=np.int64),
                                   lens_c)[: T - k + 1]
                pos_in_doc = (np.arange(T - k + 1, dtype=np.int64)
                              - starts_tok[doc_of])
                valid = pos_in_doc <= (lens_c[doc_of] - k)
                grams[long_slot] = poly[valid]
            short_docs = np.flatnonzero((lens_c > 0) & (lens_c < k))
            if len(short_docs):
                tok_doc = np.repeat(np.arange(nc, dtype=np.int64), lens_c)
                short_tok = np.isin(tok_doc, short_docs)
                pos_tok = (np.arange(T, dtype=np.int64)
                           - starts_tok[tok_doc])[short_tok]
                wt = th[short_tok] * _GRAM_W[pos_tok]
                sl = lens_c[short_docs]
                st = np.zeros(len(short_docs), dtype=np.int64)
                np.cumsum(sl[:-1], out=st[1:])
                grams[~long_slot] = np.add.reduceat(wt, st)
            # permute + per-doc min: one reused buffer, P passes
            if buf is None or len(buf) < total_g:
                buf = np.empty(max(total_g, chunk_tokens),
                               dtype=np.uint64)
            v = buf[:total_g]
            nz = g_c > 0
            gs = gram_offs[:-1][nz]
            rows = d0 + np.flatnonzero(nz)
            for p in range(P):
                np.multiply(grams, a[p], out=v)
                v += b[p]
                v %= np.uint64(_MERSENNE)
                sig[rows, p] = np.minimum.reduceat(v, gs)
        d0 = d1
    return sig


def _doc_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Sorted-unique uint64 hash per DISTINCT word-k-shingle of
    ``text``, with ``ops.text.shingles`` semantics exactly: empty text
    -> no shingles; fewer-than-k tokens -> ONE whole-text shingle
    (unlike ``_doc_gram_hashes``' C4 empty-if-short rule). Token list
    matches shingles' whitespace collapse (str.split() == \\s+ split).
    Backs the opt-in hashed ngram_jaccard verify."""
    toks = (text or "").lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    if len(toks) <= k:
        return (th * _GRAM_W[: len(toks)]).sum(keepdims=True)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(th, k)  # (S, k) view, no copy
    return np.unique((win * _GRAM_W[None, :k]).sum(axis=1))


def _doc_minhash(text: str, a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """MinHash signature over word-k-gram hashes. K-gram hashes are a
    position-weighted polynomial of per-token stable hashes (vectorized
    sliding window; uint64 wraparound arithmetic) — a different but
    equally uniform gram hash than hashing the joined shingle STRING,
    chosen because it needs one blake2 call per distinct token instead
    of one per shingle. Signature values therefore differ from a
    string-shingle implementation, but estimation quality (matching
    min-fraction ~ Jaccard) is the same and both LSH plans use THIS
    function consistently."""
    toks = (text or "").lower().split()
    if not toks:
        return np.full(len(a), _MAXU64, dtype=np.uint64)
    # (P, S) permuted hashes -> min over shingles; modular arithmetic in
    # object-free uint64 with wraparound is fine for min-hashing purposes
    return _minhash_from_th(_token_hashes(toks), a, b, k)


def _distinct_pairs(pairs, num_partitions: int | None = None):
    """Distinct (id_a, id_b) pair rows — first row per pair survives
    (rows for the same pair carry identical estimates, so survival is
    deterministic). Pair cardinality scales with the corpus's duplicate
    rate (web corpora run 30-50% dups), so this is the coarse-bucket
    vectorized plan: hash the pair into a cpu-scaled partition count,
    sort each bucket once, mark pair boundaries by adjacent comparison
    — P Python calls total instead of one per distinct pair."""
    from raydoc.ops.relational import _cpu_cap

    P = num_partitions or max(4, _cpu_cap())

    def _bucket(b: pa.Table) -> pa.Table:
        a = b.column("id_a").combine_chunks().to_numpy(zero_copy_only=False)
        c = b.column("id_b").combine_chunks().to_numpy(zero_copy_only=False)
        part = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + c.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return b.append_column("_part", pa.array(part))

    def _dedupe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # ADVICE r02: starts=[0] would mis-take
            return g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[("id_a", "ascending"),
                                            ("id_b", "ascending")])
        t = g.take(idx)
        a = t.column("id_a").combine_chunks().to_numpy(zero_copy_only=False)
        c = t.column("id_b").combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(
            ([True], (a[1:] != a[:-1]) | (c[1:] != c[:-1]))))
        return t.take(pa.array(starts)).drop_columns(["_part"])

    from raydoc.ops.bucketing import _coalesce_typed

    return _coalesce_typed(
        pairs.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_part").map_groups(_dedupe, batch_format="pyarrow"))


def minhash_signatures(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
):
    """id + fixed-size minhash signature (list<uint64> of num_perm)."""
    a, b = _perm_params(num_perm)

    def _sig(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        th, offs = _batch_token_hashes(batch.column(text_col))
        sig = _batch_minhash(th, offs, a, b, shingle_k)
        n, P = sig.shape
        lst = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * P, P, dtype=np.int32),
                     pa.int32()),
            pa.array(sig.ravel()))
        return pa.Table.from_pydict({id_col: ids, "sig": lst})

    return ds.map_batches(_sig, batch_format="pyarrow")


def _pair_id_rows(id_col: str):
    """map_batches UDF: (id_a, id_b) pair rows -> one-column table of
    the batch-distinct ids on either side (global dedup is done by the
    consumer — ``pc.unique`` in a broadcast probe or a distinct
    shuffle)."""

    def _ids(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [c for col in ("id_a", "id_b") for c in b.column(col).chunks]
        )
        return pa.Table.from_pydict({id_col: pc.unique(both)})

    return _ids


def _attach_pair_values(pairs, vals_ds, id_col: str, val_col: str, side: str,
                        carry: dict, val_type: pa.DataType,
                        num_partitions: int | None = None):
    """Set ``<val_col>_<side>`` on each (id_a, id_b, *carry) pair row by
    co-partitioning pair rows and (id, value) rows on that side's id —
    the tag-union-``groupby.map_groups`` pattern (Ray's Dataset.join
    emits schemaless empty blocks that break chained joins; see
    relational.shuffle_join's pitfall note)."""
    out_col = f"{val_col}_{side}"
    key = f"id_{side}"
    cols = {"id_a": pa.int64(), "id_b": pa.int64(), **carry}

    def _tag_pairs(b: pa.Table) -> pa.Table:
        d = {c: b.column(c) for c in cols}
        d["_k"] = b.column(key)
        d["_v"] = pa.nulls(b.num_rows, val_type)
        d["_is_val"] = pa.array([False] * b.num_rows, pa.bool_())
        return pa.Table.from_pydict(d)

    def _tag_vals(b: pa.Table) -> pa.Table:
        d = {c: pa.nulls(b.num_rows, t) for c, t in cols.items()}
        d["_k"] = b.column(id_col)
        d["_v"] = b.column(val_col).cast(val_type)
        d["_is_val"] = pa.array([True] * b.num_rows, pa.bool_())
        return pa.Table.from_pydict(d)

    tagged = pairs.map_batches(_tag_pairs, batch_format="pyarrow").union(
        vals_ds.map_batches(_tag_vals, batch_format="pyarrow")
    )

    # the attach key space is the candidate-id set (duplicate-rate-
    # sized), so like the other corpus-sized groupbys the merge is
    # hash-bucketed into P coarse groups and vectorized per bucket:
    # sort (key asc, value-rows-first), find each run's value row, and
    # ``pc.take`` with null indices for value-less runs — list-typed
    # values (signatures) attach zero-copy, no per-group ``as_py``.
    from raydoc.ops.relational import _cpu_cap

    # ADVICE r02: expose the bucket-count knob — at scale a bucket is
    # ~pairs/P rows and must fit one worker's heap, so callers size
    # P ~ total_bytes/256MB instead of the cpu default
    P = num_partitions or max(4, _cpu_cap())

    def _bucket(b: pa.Table) -> pa.Table:
        k = b.column("_k").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        part = np.mod(k.astype(np.uint64), np.uint64(P)).astype(np.int64)
        return b.append_column("_part", pa.array(part))

    def _merge_bucket(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("_k", "ascending"),
                                                ("_is_val", "descending")])
        t = group.take(idx)
        k = t.column("_k").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        isv = t.column("_is_val").combine_chunks().to_numpy(
            zero_copy_only=False)
        n = len(k)
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        run_len = np.diff(np.append(starts, n))
        run_of = np.repeat(np.arange(len(starts)), run_len)
        has_val = isv[starts]
        pair_mask = ~isv
        take_idx = starts[run_of[pair_mask]]
        vals = t.column("_v").combine_chunks().take(
            pa.array(take_idx, pa.int64(),
                     mask=~has_val[run_of[pair_mask]]))
        prows = t.filter(pa.array(pair_mask))
        out = {c: prows.column(c) for c in cols}
        out[out_col] = vals
        return pa.Table.from_pydict(out)

    return tagged.map_batches(_bucket, batch_format="pyarrow") \
        .groupby("_part").map_groups(_merge_bucket, batch_format="pyarrow")


def _minhash_pairs_carry(ds, text_col, id_col, a, b, bands, rows_per_band,
                         shingle_k, threshold, max_bucket_docs=None):
    """Single-pass LSH plan: band rows carry the signature, buckets
    estimate inline (see minhash_lsh_pairs for when this is safe)."""

    def _band_rows(batch: pa.Table) -> pa.Table:
        # batch signature matrix + vectorized band keys (r05): empty
        # docs (no tokens) are dropped — no signature, no bucket
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        th_all, offs = _batch_token_hashes(batch.column(text_col))
        sig = _batch_minhash(th_all, offs, a, b, shingle_k)
        ne = np.diff(offs) > 0
        sig, ids = sig[ne], ids[ne]
        n = len(ids)
        num_perm = bands * rows_per_band
        with np.errstate(over="ignore"):
            keys = (sig.reshape(n, bands, rows_per_band)
                    * _GRAM_W[None, None, :rows_per_band]).sum(axis=2) \
                + _BAND_SALT[None, :bands]
        sig_rep = np.repeat(sig, bands, axis=0)
        lst = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n * bands + 1) * num_perm, num_perm,
                               dtype=np.int32), pa.int32()),
            pa.array(sig_rep.ravel()))
        return pa.Table.from_pydict(
            {id_col: pa.array(np.repeat(ids, bands), pa.int64()),
             "band_key": pa.array(keys.ravel(), pa.uint64()),
             "sig": lst}
        )

    # coarse-bucketed vectorized clique + inline estimate (r03; was one
    # Python map_groups call per distinct band key): signatures decode
    # zero-copy to an (n, P) matrix, pair indices come from one
    # segmented computation, estimates from matrix compares. r04:
    # pairs are deduped by doc id BEFORE estimating (repeats of a pair
    # whose band keys collided into the same coarse bucket estimate
    # once), and the estimate runs through the chunked-preallocated
    # gather (bucketing.pair_match_fraction): an unchunked ``sigs[ai]``
    # gather on a hot bucket was MEASURED at 11.3 GiB peak heap /
    # 228 s in one task at 100k mass-dup docs, and fresh ~0.5 GB
    # allocations under 32-way concurrency page-fault-storm to
    # 103 s/task on their own.
    def _pairs_bucket(t: pa.Table, starts: np.ndarray,
                      counts: np.ndarray) -> pa.Table:
        from raydoc.ops.bucketing import clique_pair_indices
        from raydoc.util import embedding_matrix

        empty = pa.Table.from_pydict(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        if max_bucket_docs is not None:
            from raydoc.ops.bucketing import capped_pair_indices

            ai, bi = capped_pair_indices(starts, counts, max_bucket_docs)
        else:
            ai, bi = clique_pair_indices(starts, counts)
        if len(ai) == 0:
            return empty
        ia, ib = ids[ai], ids[bi]
        ne = ia != ib
        ai, bi, ia, ib = ai[ne], bi[ne], ia[ne], ib[ne]
        if len(ai) == 0:
            return empty
        # dedupe doc-id pairs (sig rows are per-doc copies, so any
        # occurrence's row indices estimate identically)
        order = np.lexsort((ib, ia))
        ai, bi, ia, ib = ai[order], bi[order], ia[order], ib[order]
        first = np.concatenate(
            ([True], (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])))
        ai, bi, ia, ib = ai[first], bi[first], ia[first], ib[first]
        sigs = embedding_matrix(t.column("sig"), dtype=np.uint64)
        from raydoc.ops.bucketing import pair_match_fraction

        est = pair_match_fraction(sigs, ai, bi)
        m = est >= threshold
        return pa.Table.from_pydict(
            {"id_a": pa.array(ia[m], pa.int64()),
             "id_b": pa.array(ib[m], pa.int64()),
             "est_jaccard": pa.array(est[m], pa.float64())}
        )

    from raydoc.ops.bucketing import bucketed_sorted_apply

    pairs = bucketed_sorted_apply(
        ds.map_batches(_band_rows, batch_format="pyarrow"),
        ["band_key"], [("band_key", "ascending"), (id_col, "ascending")],
        _pairs_bucket)
    return _distinct_pairs(pairs)


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    carry_signatures: bool | None = None,
    max_bucket_docs: int | None = None,
):
    """Near-duplicate candidate pairs via banded MinHash LSH.

    shingle -> minhash -> band-hash bucket groupby -> within-bucket
    candidate pairs -> estimated Jaccard (matching minhash fraction)
    filtered at ``threshold``. Documents with no shingles
    (empty/whitespace text) are excluded — they are not near-duplicates
    by this method (exact_dedup handles them) and would otherwise
    collapse into one O(n^2) bucket. Output: (id_a, id_b, est_jaccard)
    with id_a < id_b. Two physically different plans, identical output:

    * ``carry_signatures=True`` (small inputs): one pipelined pass —
      band rows carry the full signature, buckets estimate inline.
      Shuffle payload is bands x (sig + key) per doc: fine up to a few
      GB, catastrophic at web scale.
    * ``carry_signatures=False`` (scale): band rows carry (id,
      band_key) only (~bands x 24 B per doc); signatures are recomputed
      just for CANDIDATE docs and either broadcast (<= _BROADCAST_CAP
      candidates) or co-partitioned onto the pairs. Costs a second read
      of the corpus, which at scale is nothing next to an 8 KB/doc
      all-to-all.
    * ``None`` (default): auto — carry when ``ds.count()`` (metadata
      lookup for parquet reads) says the sig shuffle stays under ~2 GB.

    ``max_bucket_docs`` (r04): per-band-bucket size cap. ``None``
    keeps exact clique semantics (every within-bucket pair emitted —
    what the pairs ORACLE checks). With a cap, buckets larger than it
    emit STAR pairs (min-id vs each member) via
    ``bucketing.capped_pair_indices``: a mass-duplicated boilerplate
    cluster — a 213k-doc single-band bucket at 1M docs was MEASURED to
    demand 22.6e9 pair indices (169 GiB) uncapped — costs linear
    pairs, connectivity (and therefore dedup victims/components) is
    preserved for true-dup runs, and only cross-threshold pairs hidden
    behind a failing star pair can be missed. Dedup pipelines
    (curate_documents) set this; exact pair enumeration leaves it off.
    """
    import ray

    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm)

    if carry_signatures is None:
        carry_signatures = ds.count() * bands * num_perm * 8 <= 2 << 30

    if carry_signatures:
        return _minhash_pairs_carry(
            ds, text_col, id_col, a, b, bands, rows_per_band,
            shingle_k, threshold, max_bucket_docs=max_bucket_docs,
        )

    def _band_rows(batch: pa.Table) -> pa.Table:
        # slim variant of the carry plan's band stage (no sig column):
        # batch signature matrix + vectorized band keys (r05)
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        th_all, offs = _batch_token_hashes(batch.column(text_col))
        sig = _batch_minhash(th_all, offs, a, b, shingle_k)
        ne = np.diff(offs) > 0
        sig, ids = sig[ne], ids[ne]
        n = len(ids)
        with np.errstate(over="ignore"):
            keys = (sig.reshape(n, bands, rows_per_band)
                    * _GRAM_W[None, None, :rows_per_band]).sum(axis=2) \
                + _BAND_SALT[None, :bands]
        return pa.Table.from_pydict(
            {
                id_col: pa.array(np.repeat(ids, bands), pa.int64()),
                "band_key": pa.array(keys.ravel(), pa.uint64()),
            }
        )

    # candidate pair generation is coarse-bucketed and VECTORIZED
    # (r03): sort each bucket ONCE by (band_key, id), dedupe adjacent
    # (band_key, id) rows, then every band bucket's clique pairs come
    # from one segmented index computation — P Python calls total
    # instead of one map_groups call per DISTINCT BAND KEY (a
    # corpus-sized key space: ~bands x docs / cluster_size).
    def _clique_bucket(t: pa.Table, starts: np.ndarray,
                       counts: np.ndarray) -> pa.Table:
        from raydoc.ops.bucketing import clique_pair_indices, run_segments

        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        if len(ids) == 0:
            z = pa.array([], pa.int64())
            return pa.Table.from_pydict({"id_a": z, "id_b": z})
        keys = t.column("band_key").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = np.concatenate(
            ([True], (keys[1:] != keys[:-1]) | (ids[1:] != ids[:-1])))
        t2 = t.filter(pa.array(keep))
        ids = ids[keep]
        s2, c2 = run_segments(t2, ["band_key"])
        if max_bucket_docs is not None:
            from raydoc.ops.bucketing import capped_pair_indices

            ai, bi = capped_pair_indices(s2, c2, max_bucket_docs)
        else:
            ai, bi = clique_pair_indices(s2, c2)
        ia, ib = ids[ai], ids[bi]
        if len(ia):
            # within-bucket dedupe (r04): repeats of a pair whose band
            # keys collided into this coarse bucket are emitted once,
            # shrinking the _distinct_pairs shuffle on dup-heavy input
            order = np.lexsort((ib, ia))
            ia, ib = ia[order], ib[order]
            first = np.concatenate(
                ([True], (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])))
            ia, ib = ia[first], ib[first]
        return pa.Table.from_pydict(
            {"id_a": pa.array(ia, pa.int64()),
             "id_b": pa.array(ib, pa.int64())}
        )

    from raydoc.ops.bucketing import bucketed_sorted_apply

    candidates = _distinct_pairs(
        bucketed_sorted_apply(
            ds.map_batches(_band_rows, batch_format="pyarrow"),
            ["band_key"],
            [("band_key", "ascending"), (id_col, "ascending")],
            _clique_bucket)
    ).materialize()  # small vs corpus; reused for ids + the attach

    # candidate ids stay a DATASET — never collected on the driver
    # (web corpora run 30-50% duplicates; O(corpus) driver sets OOM).
    # GLOBALLY distinct (late r04): the per-block-deduped count
    # overshoots true cardinality by the cross-block repeat factor —
    # measured 1.37M upper bound vs well-under-cap true distinct on a
    # 900k-doc/683k-candidate corpus, which silently tipped the
    # estimate onto the co-partition plan (two 45 s sorts) when the
    # broadcast plan was cheap and correct. One bucketed distinct over
    # the id table costs far less than the misrouted estimate.
    from raydoc.ops.relational import distinct_on, semi_join

    cand_ids = distinct_on(
        candidates.map_batches(_pair_id_rows(id_col),
                               batch_format="pyarrow"),
        id_col, bucketed=True).materialize()
    n_cand = cand_ids.count()

    sigs = minhash_signatures(
        semi_join(ds, cand_ids, id_col, id_col,
                  broadcast_cap=_BROADCAST_CAP),
        text_col, id_col, num_perm=num_perm, shingle_k=shingle_k,
    )
    sig_t = pa.list_(pa.uint64())

    if n_cand <= _BROADCAST_CAP:
        # fast path: candidate sig blocks fit comfortably in the object
        # store (num_perm x 8 B each) — workers fetch the block refs
        # once (actor __init__) and estimate every pair in a single map;
        # the driver only ever holds the refs
        sig_refs = list(sigs.materialize().to_arrow_refs())

        class _Estimate:
            # r04 vectorized: sigs decode ONCE per actor to a sorted
            # id vector + (n, num_perm) matrix; each batch resolves
            # both pair columns with searchsorted and estimates via one
            # rowwise matrix compare (the r03 per-pair Python loop paid
            # dict lookups + a scalar np.mean per candidate pair)
            def __init__(self, refs) -> None:
                from raydoc.util import embedding_matrix

                blocks = [t for t in ray.get(list(refs)) if t.num_rows]
                if blocks:
                    t = pa.concat_tables(blocks)
                    ids = t.column(id_col).combine_chunks().to_numpy(
                        zero_copy_only=False)
                    mat = embedding_matrix(t.column("sig"),
                                           dtype=np.uint64)
                    order = np.argsort(ids, kind="stable")
                    self.ids = ids[order]
                    self.mat = mat[order]
                else:
                    self.ids = np.empty(0, dtype=np.int64)
                    self.mat = np.empty((0, num_perm), dtype=np.uint64)

            def _resolve(self, col) -> tuple[np.ndarray, np.ndarray]:
                v = col.combine_chunks().to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self.ids, v)
                pos_c = np.minimum(pos, len(self.ids) - 1)
                return pos_c, self.ids[pos_c] == v

            def __call__(self, bt: pa.Table) -> pa.Table:
                z = pa.array([], pa.int64())
                if bt.num_rows == 0 or len(self.ids) == 0:
                    return pa.Table.from_pydict(
                        {"id_a": z, "id_b": z,
                         "est_jaccard": pa.array([], pa.float64())})
                from raydoc.ops.bucketing import pair_match_fraction

                pa_pos, a_ok = self._resolve(bt.column("id_a"))
                pb_pos, b_ok = self._resolve(bt.column("id_b"))
                est = pair_match_fraction(self.mat, pa_pos, pb_pos)
                keep = a_ok & b_ok & (est >= threshold)
                ia = bt.column("id_a").combine_chunks().to_numpy(
                    zero_copy_only=False)
                ib = bt.column("id_b").combine_chunks().to_numpy(
                    zero_copy_only=False)
                return pa.Table.from_pydict(
                    {"id_a": pa.array(ia[keep], pa.int64()),
                     "id_b": pa.array(ib[keep], pa.int64()),
                     "est_jaccard": pa.array(est[keep], pa.float64())}
                )

        from raydoc.util import cpu_cap

        return candidates.map_batches(
            _Estimate, fn_constructor_args=(sig_refs,),
            batch_format="pyarrow", concurrency=(1, cpu_cap()),
        )

    # scale path: too many candidates to broadcast (web corpora can be
    # 30-50% duplicates) — co-partition sigs onto the pairs instead
    sigs = sigs.materialize()  # reused by both attaches
    withA = _attach_pair_values(candidates, sigs, id_col, "sig", "a", {}, sig_t)
    withB = _attach_pair_values(withA, sigs, id_col, "sig", "b",
                                {"sig_a": sig_t}, sig_t)

    def _estimate(bt: pa.Table) -> pa.Table:
        # r04 vectorized (was a per-pair Python loop): drop pairs with
        # a missing side, decode both sig columns to matrices, one
        # rowwise compare per batch
        from raydoc.util import embedding_matrix

        bt = bt.filter(pc.and_(pc.is_valid(bt.column("sig_a")),
                               pc.is_valid(bt.column("sig_b"))))
        if bt.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.Table.from_pydict(
                {"id_a": z, "id_b": z,
                 "est_jaccard": pa.array([], pa.float64())})
        sa = embedding_matrix(bt.column("sig_a"), dtype=np.uint64)
        sb = embedding_matrix(bt.column("sig_b"), dtype=np.uint64)
        eq = sa == sb
        est = eq.sum(axis=1) / eq.shape[1]
        keep = est >= threshold
        mask = pa.array(keep)
        return pa.Table.from_pydict(
            {"id_a": bt.column("id_a").filter(mask).combine_chunks(),
             "id_b": bt.column("id_b").filter(mask).combine_chunks(),
             "est_jaccard": pa.array(est[keep], pa.float64())}
        )

    return withB.map_batches(_estimate, batch_format="pyarrow")


def near_dup_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                   threshold: float = 0.7,
                   max_bucket_docs: int | None = 512):
    """Remove within-dataset near-duplicates: MinHash-LSH pairs, keep
    the smaller id of each pair, drop the rest with an anti semi-join.
    The standalone form of curate_documents' near-dup stage
    (pipelines/training_data.py) for pipelines that want dedup without
    the quality gates — victims stay an id DATASET end to end (never a
    driver-side set), and oversized boilerplate band buckets are
    star-paired over ``max_bucket_docs`` (victim detection preserved,
    quadratic pair enumeration avoided)."""
    from raydoc.ops.relational import distinct_on, semi_join

    pairs = minhash_lsh_pairs(ds, text_col, id_col, threshold=threshold,
                              max_bucket_docs=max_bucket_docs)

    def _victims(b: pa.Table) -> pa.Table:
        v = pc.max_element_wise(b.column("id_a").combine_chunks(),
                                b.column("id_b").combine_chunks())
        return pa.Table.from_pydict({id_col: pc.unique(v)})

    victims_raw = pairs.map_batches(
        _victims, batch_format="pyarrow"
    ).materialize()  # O(victims) ids, not O(corpus) text
    if victims_raw.count() == 0:
        return ds  # schemaless-empty guard, same as curate_documents
    victims = distinct_on(victims_raw, id_col, bucketed=True)
    return semi_join(ds, victims, id_col, id_col, anti=True)


# bit-matrix unpack cap: the unpack buffer is 65536 tokens x 64 bits x
# int32 = 16.8 MB, preallocated ONCE per call and reused across chunks
# (the shift writes straight into it, so there is no transient uint64
# (T, 64) matrix — ADVICE r04: that intermediate alone was ~33.5 MB
# per chunk). A whole 1024-doc batch of long docs would otherwise
# unpack to a fresh >100 MB matrix, the allocation class that
# page-fault-storms under full-width concurrency on this hardware (see
# BASELINE.md and bucketing.pair_cosine, which exists to bound exactly
# this); the remaining per-chunk transients (reduceat output, acc) are
# O(docs x 64), a few hundred KB.
_SIMHASH_CHUNK_TOKENS = 65536


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a 64-bit SimHash of whitespace tokens (count-weighted).
    Vectorized: distinct-token hashes (per-process cache) unpack to a
    (T, 64) bit matrix and a segmented column-sum (np.add.reduceat at
    doc offsets) replaces the per-token Python loop — summing per-token
    signs equals the scalar form's count-weighted unique-token sum, and
    unique-by-hash equals unique-by-string because equal tokens share a
    hash. The unpack runs in doc-aligned chunks of
    ``_SIMHASH_CHUNK_TOKENS`` so no fresh matrix exceeds ~17 MB."""
    shifts = np.arange(64, dtype=np.uint64)
    th_all, offs = _batch_token_hashes(batch.column(text_col))
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    lens = np.diff(offs)
    nonempty = np.flatnonzero(lens > 0)
    ends = offs[nonempty + 1]  # token end per nonempty doc
    start = 0
    buf = None
    while start < len(nonempty):
        tok0 = offs[nonempty[start]]
        # widest run of docs whose token span fits the cap; always
        # advance by >=1 doc so a single over-cap doc still processes
        # (one oversized unpack, not an infinite loop)
        stop = max(start + 1,
                   int(np.searchsorted(ends, tok0 + _SIMHASH_CHUNK_TOKENS,
                                       side="right")))
        seg = nonempty[start:stop]
        th = th_all[tok0:ends[stop - 1]]
        if buf is None or buf.shape[0] < len(th):
            buf = np.empty((max(len(th), _SIMHASH_CHUNK_TOKENS), 64),
                           dtype=np.int32)
        bits = buf[: len(th)]
        # unsafe-cast shift straight into the reused int32 buffer: bit 0
        # survives the truncation, and no uint64 (T, 64) temporary is
        # ever allocated (ADVICE r04)
        np.right_shift(th[:, None], shifts[None, :], out=bits,
                       casting="unsafe")
        np.bitwise_and(bits, 1, out=bits)
        # consecutive nonempty docs are token-adjacent (empty docs
        # contribute zero tokens), so reduceat segments at the docs'
        # chunk-relative starts cover the chunk exactly
        sums = np.add.reduceat(bits, offs[seg] - tok0, axis=0)
        acc = 2 * sums - lens[seg, None].astype(np.int32)
        bitsv = (acc > 0).astype(np.uint64)
        out[seg] = (bitsv << shifts[None, :]).sum(axis=1)
        start = stop
    return batch.append_column(
        "simhash", pa.array(out, pa.uint64()))


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3,
                  max_bucket_docs: int | None = None):
    """Near-dup pairs by SimHash: band the 64-bit hash into 4 x 16-bit
    chunks (any pair within hamming<=3 shares at least one chunk), bucket
    groupby per chunk, verify hamming distance within buckets.

    ``max_bucket_docs`` (r04, opt-in like ``minhash_lsh_pairs``): a
    mass-duplicated cluster puts its whole membership in one 16-bit
    chunk bucket per band; buckets over the cap emit STAR pairs
    (``bucketing.capped_pair_indices``) so the candidate set stays
    linear — connectivity (and dedup victims) preserved for true-dup
    runs, exact pair enumeration (what the pairs oracle checks) needs
    ``None``."""

    def _bands(batch: pa.Table) -> pa.Table:
        batch = simhash_batch(batch, text_col)
        keep = pc.invert(pc.equal(
            pc.utf8_trim_whitespace(
                pc.fill_null(pc.cast(batch.column(text_col), pa.string()),
                             "")), ""))
        batch = batch.filter(keep)  # empty docs all hash to 0: skip
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hs = batch.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        n = len(ids)
        # vectorized 4-way band explode; int64 bkey = band*2^16 + chunk
        # (8 B in the bucket shuffle instead of a "<band>:<chunk>" string)
        band = np.tile(np.arange(4, dtype=np.uint64), n)
        hrep = np.repeat(hs, 4)
        chunk = (hrep >> (band * np.uint64(16))) & np.uint64(0xFFFF)
        bkey = (band << np.uint64(16)) | chunk
        return pa.Table.from_pydict(
            {id_col: pa.array(np.repeat(ids, 4)),
             "bkey": pa.array(bkey.astype(np.int64), pa.int64()),
             "simhash": pa.array(hrep, pa.uint64())}
        )

    # coarse-bucketed vectorized clique + hamming verify (r03; was one
    # Python map_groups call per distinct 16-bit chunk bucket): sorted
    # by (bkey, id), every bucket's candidate pairs come from one
    # segmented index computation, hamming from a SWAR popcount over
    # the xor'd signatures — no per-pair Python.
    def _pairs_bucket(t: pa.Table, starts: np.ndarray,
                      counts: np.ndarray) -> pa.Table:
        from raydoc.ops.bucketing import (capped_pair_indices,
                                          clique_pair_indices,
                                          popcount_u64)

        z = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"id_a": z, "id_b": z, "hamming": z})
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        hs = t.column("simhash").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        if max_bucket_docs is not None:
            ai, bi = capped_pair_indices(starts, counts, max_bucket_docs)
        else:
            ai, bi = clique_pair_indices(starts, counts)
        if len(ai) == 0:
            return pa.Table.from_pydict(
                {"id_a": z, "id_b": z, "hamming": z})
        d = popcount_u64(np.bitwise_xor(hs[ai], hs[bi]))
        keep = (d <= max_hamming) & (ids[ai] != ids[bi])
        return pa.Table.from_pydict(
            {"id_a": pa.array(ids[ai][keep], pa.int64()),
             "id_b": pa.array(ids[bi][keep], pa.int64()),
             "hamming": pa.array(d[keep], pa.int64())}
        )

    from raydoc.ops.bucketing import bucketed_sorted_apply

    pairs = bucketed_sorted_apply(
        ds.map_batches(_bands, batch_format="pyarrow"),
        ["bkey"], [("bkey", "ascending"), (id_col, "ascending")],
        _pairs_bucket)
    return _distinct_pairs(pairs)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard similarity (the verify oracle for the
    LSH estimates; O(len) per pair — use on candidate pairs only)."""
    sa, sb = set(shingles(text_a, k)), set(shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    candidate_threshold: float = 0.35,
    shingle_k: int = 5,
    max_bucket_docs: int | None = None,
    hashed_grams: bool = False,
):
    """EXACT n-gram Jaccard near-dup pairs, LSH-pruned.

    Phase 1: MinHash+LSH candidates at a LOWER estimated threshold (so
    near-threshold pairs aren't lost to estimation noise). Phase 2:
    attach each side's text via a hash-partitioned groupby on the id
    (tag-union-map_groups, the same co-partition pattern as
    ops.window.asof_join — Ray's Dataset.join emits schemaless empty
    blocks that break chained joins) and verify exact word-k-gram
    Jaccard. Only CANDIDATE documents' texts enter the attach shuffle:
    the candidate ids stay a Dataset and the corpus is filtered by a
    ``semi_join`` (block-ref broadcast when the id set is small, a
    distinct-key shuffle join otherwise — never a driver-side set), so
    the exchange never moves the full text corpus. Output: (id_a, id_b,
    jaccard) with id_a < id_b, jaccard >= threshold.

    ``max_bucket_docs`` passes through to the candidate LSH stage (see
    minhash_lsh_pairs): opt-in star-pairing for mass-dup band buckets;
    ``None`` (default) keeps exact pair enumeration — what the
    docs_jaccard_pairs oracle checks.

    ``hashed_grams`` (opt-in scale path): verify over sorted-unique
    uint64 shingle HASHES (`_doc_shingle_hashes`) with a C-merge
    ``np.intersect1d`` per pair instead of Python string-set
    intersection — same shingle semantics, ~|A|x|B|/2^64 per-pair
    collision odds of overcounting an intersection by one. The default
    stays exact-string, which is what the SQL oracle computes.
    """
    import ray

    candidates = minhash_lsh_pairs(
        ds, text_col, id_col, shingle_k=shingle_k,
        threshold=candidate_threshold,
        max_bucket_docs=max_bucket_docs,
    ).materialize()  # small vs corpus; reused for ids + both attaches

    from raydoc.ops.relational import distinct_on, semi_join

    # candidate ids stay a DATASET (no driver collection), globally
    # distinct so n_cand is true cardinality — see minhash_lsh_pairs
    cand_ids = distinct_on(
        candidates.map_batches(_pair_id_rows(id_col),
                               batch_format="pyarrow"),
        id_col, bucketed=True).materialize()
    n_cand = cand_ids.count()
    docs = semi_join(ds, cand_ids, id_col, id_col,
                     broadcast_cap=_TEXT_BROADCAST_CAP)
    cand = candidates.select_columns(["id_a", "id_b"])

    def _batch_jaccard(ids_a, ids_b, text_of) -> tuple[list, list, list]:
        """Exact jaccard for a batch of id pairs, memoizing each doc's
        shingle set per batch (r04): a doc that appears in many pairs
        — every star pair of a capped mass-dup bucket shares its
        center — tokenizes ONCE per batch instead of once per pair.
        Semantics identical to ngram_jaccard (two empty sets -> 1.0)."""
        grams: dict = {}

        if hashed_grams:
            def _gs(i):
                s = grams.get(i)
                if s is None:
                    s = _doc_shingle_hashes(text_of(i) or "", shingle_k)
                    grams[i] = s
                return s
        else:
            def _gs(i):
                s = grams.get(i)
                if s is None:
                    s = set(shingles(text_of(i) or "", shingle_k))
                    grams[i] = s
                return s

        ia, ib, js = [], [], []
        for x, y in zip(ids_a, ids_b):
            sa, sb = _gs(x), _gs(y)
            na, nb = len(sa), len(sb)
            if not na and not nb:
                j = 1.0
            elif hashed_grams:
                inter = int(np.intersect1d(
                    sa, sb, assume_unique=True).size)
                j = inter / (na + nb - inter)
            else:
                inter = len(sa & sb)
                j = inter / (na + nb - inter)
            if j >= threshold:
                ia.append(x)
                ib.append(y)
                js.append(j)
        return ia, ib, js

    if n_cand <= _TEXT_BROADCAST_CAP:
        # fast path: candidate TEXTS fit the object store — workers
        # fetch the filtered-doc block refs once (actor __init__) and
        # verify pairs in a single map; the driver only holds refs
        doc_refs = list(
            docs.select_columns([id_col, text_col]).materialize()
            .to_arrow_refs()
        )

        class _Verify:
            def __init__(self, refs) -> None:
                self.texts = {}
                for t in ray.get(list(refs)):
                    if not t.num_rows:  # schemaless empty blocks
                        continue
                    for i, x in zip(t.column(id_col).to_pylist(),
                                    t.column(text_col).to_pylist()):
                        self.texts[i] = x

            def __call__(self, b: pa.Table) -> pa.Table:
                ia, ib, js = _batch_jaccard(
                    b.column("id_a").to_pylist(),
                    b.column("id_b").to_pylist(),
                    self.texts.get)
                return pa.Table.from_pydict(
                    {"id_a": pa.array(ia, pa.int64()),
                     "id_b": pa.array(ib, pa.int64()),
                     "jaccard": pa.array(js, pa.float64())}
                )

        from raydoc.util import cpu_cap

        return cand.map_batches(_Verify, fn_constructor_args=(doc_refs,),
                                batch_format="pyarrow",
                                concurrency=(1, cpu_cap()))

    # scale path: co-partition candidate texts onto the pairs
    docs = docs.materialize()  # reused by both attaches
    txt_t = pa.large_string()
    withA = _attach_pair_values(cand, docs, id_col, text_col, "a", {}, txt_t)
    withB = _attach_pair_values(withA, docs, id_col, text_col, "b",
                                {f"{text_col}_a": txt_t}, txt_t)

    def _verify(b: pa.Table) -> pa.Table:
        # texts ride the batch; the per-batch memoization keys on doc
        # id so a doc repeated across the batch's pairs tokenizes once
        texts = {}
        for i, t in zip(b.column("id_a").to_pylist(),
                        b.column(f"{text_col}_a").to_pylist()):
            texts[i] = t
        for i, t in zip(b.column("id_b").to_pylist(),
                        b.column(f"{text_col}_b").to_pylist()):
            texts[i] = t
        ia, ib, js = _batch_jaccard(
            b.column("id_a").to_pylist(), b.column("id_b").to_pylist(),
            texts.get)
        return pa.Table.from_pydict(
            {"id_a": pa.array(ia, pa.int64()), "id_b": pa.array(ib, pa.int64()),
             "jaccard": pa.array(js, pa.float64())}
        )

    return withB.map_batches(_verify, batch_format="pyarrow")


def embedding_near_dup_pairs(
    ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    max_bucket_docs: int | None = None,
):
    """Embedding-cosine near-dup via random-hyperplane bucketing.

    Sign-pattern of ``num_planes`` fixed random projections buckets the
    vectors (near-identical vectors land in the same bucket with high
    probability; each vector lands in exactly ONE bucket, so no
    cross-bucket pair dedup is needed); exact cosine is verified within
    buckets only. Output: (id_a, id_b, cosine) with id_a < id_b,
    cosine >= threshold.

    r04 rewrite: the r03 path paid one Python ``map_groups`` call per
    distinct sign pattern plus an O(L^2) Python pair loop inside it —
    the same per-key dispatch pathology ``bucketing`` removed
    everywhere else. Now the sign pattern packs into an int64 key
    vectorized, pair generation is the shared segmented-index kernel
    over a coarse-bucketed sort, and cosines come from ONE einsum over
    the gathered pair rows. ``max_bucket_docs`` (opt-in, like
    ``minhash_lsh_pairs``) star-pairs oversized buckets so a
    mass-duplicated embedding cluster costs linear pairs instead of
    C(L, 2).
    """
    from raydoc.ops.bucketing import (bucketed_sorted_apply,
                                      capped_pair_indices,
                                      clique_pair_indices, pair_cosine)

    if not 0 < num_planes < 63:
        raise ValueError(f"num_planes must be in [1, 62], got {num_planes}")
    planes_by_dim: dict[int, np.ndarray] = {}
    weights = np.uint64(1) << np.arange(num_planes, dtype=np.uint64)

    def _bucket(batch: pa.Table) -> pa.Table:
        from raydoc.util import embedding_matrix

        out_cols = [batch.column(id_col), None, batch.column(emb_col)]
        if batch.num_rows == 0:
            out_cols[1] = pa.array([], pa.int64())
        else:
            embs = embedding_matrix(batch.column(emb_col))
            dim = embs.shape[1] if embs.ndim == 2 else 0
            if dim not in planes_by_dim:
                planes_by_dim[dim] = np.random.RandomState(
                    11).standard_normal((dim, num_planes))
            signs = (embs @ planes_by_dim[dim]) > 0
            keys = (signs.astype(np.uint64) @ weights).astype(np.int64)
            out_cols[1] = pa.array(keys, pa.int64())
        return pa.Table.from_arrays(
            out_cols, names=[id_col, "bucket", emb_col])

    def _pairs_bucket(t: pa.Table, starts: np.ndarray,
                      counts: np.ndarray) -> pa.Table:
        from raydoc.util import embedding_matrix

        z = pa.array([], pa.int64())
        empty = pa.Table.from_pydict(
            {"id_a": z, "id_b": z, "cosine": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        if max_bucket_docs is not None:
            ai, bi = capped_pair_indices(starts, counts, max_bucket_docs)
        else:
            ai, bi = clique_pair_indices(starts, counts)
        if len(ai) == 0:
            return empty
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        embs = embedding_matrix(t.column(emb_col))
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        unit = embs / norms[:, None]
        # chunked-preallocated pair gather (bucketing._PAIR_CHUNK note):
        # a fresh (#pairs, D) gather was measured at 66 s/task under
        # 32-way concurrency vs ~1 s chunked
        cs = pair_cosine(unit, ai, bi)
        keep = (cs >= threshold) & (ids[ai] != ids[bi])
        return pa.Table.from_pydict(
            {"id_a": pa.array(ids[ai][keep], pa.int64()),
             "id_b": pa.array(ids[bi][keep], pa.int64()),
             "cosine": pa.array(cs[keep], pa.float64())})

    return bucketed_sorted_apply(
        ds.map_batches(_bucket, batch_format="pyarrow"),
        ["bucket"], [("bucket", "ascending"), (id_col, "ascending")],
        _pairs_bucket)


def _doc_gram_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hash per word-k-gram of ``text`` (position-weighted
    polynomial of per-token stable hashes, same gram function the
    MinHash family uses). Docs with fewer than k tokens have NO
    k-grams and return an empty array — C4-style decontamination
    semantics, and what a string-based SQL oracle computes."""
    toks = (text or "").lower().split()
    if len(toks) < k:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(toks)
    if len(toks) == k:
        return (th * _GRAM_W[:k]).sum(keepdims=True)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(th, k)  # (S, k) view, no copy
    return (win * _GRAM_W[None, :k]).sum(axis=1)


def contamination_screen(
    corpus,
    benchmark,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    broadcast_cap: int = _BROADCAST_CAP,
):
    """Benchmark-decontamination screen: corpus docs sharing at least
    one word-k-gram with ANY benchmark doc, with the count of distinct
    shared grams. The training-data op behind "remove eval-set
    contamination before pretraining" (the reference has no analogue;
    its nearest is exact content dedup, base.py:474).

    Returns a Dataset of (id_col, n_hits:int64), one row per
    contaminated doc; n_hits = number of DISTINCT k-grams of the doc
    that occur anywhere in the benchmark.

    Scale shape: both sides explode to uint64 gram hashes (8 B per
    gram, never the gram strings). The membership probe is
    ``semi_join``: benchmark gram sets small enough to broadcast are
    ``ray.put`` once and probed per batch with no shuffle (the common
    case — eval benchmarks are tiny next to a pretraining corpus);
    bigger ones fall back to a hash shuffle on the gram key. The final
    per-doc count is a partial-agg ``grouped_agg`` so the groupby
    shuffle moves one row per (batch, doc)."""
    from raydoc.ops.relational import grouped_agg, semi_join

    def _bench_grams(b: pa.Table) -> pa.Table:
        per_doc = [
            _doc_gram_hashes(t, k) for t in b.column(text_col).to_pylist()
        ]
        flat = (
            np.unique(np.concatenate(per_doc))
            if per_doc
            else np.empty(0, dtype=np.uint64)
        )
        return pa.Table.from_pydict({"gram": pa.array(flat, pa.uint64())})

    bench_grams = benchmark.map_batches(_bench_grams, batch_format="pyarrow")

    def _corpus_grams(b: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        grams_out: list[np.ndarray] = []
        ids = b.column(id_col).to_pylist()
        for i, t in zip(ids, b.column(text_col).to_pylist()):
            u = np.unique(_doc_gram_hashes(t, k))  # distinct per doc
            if len(u):
                ids_out.append(np.full(len(u), i, dtype=np.int64))
                grams_out.append(u)
        if not ids_out:
            return pa.Table.from_pydict(
                {id_col: pa.array([], pa.int64()),
                 "gram": pa.array([], pa.uint64())}
            )
        return pa.Table.from_pydict(
            {id_col: pa.array(np.concatenate(ids_out)),
             "gram": pa.array(np.concatenate(grams_out))}
        )

    corpus_grams = corpus.map_batches(_corpus_grams, batch_format="pyarrow")
    hits = semi_join(corpus_grams, bench_grams, "gram", "gram",
                     broadcast_cap=broadcast_cap)
    return grouped_agg(hits, [id_col], {"n_hits": ("count", "gram")})


def _explode_segments(batch: pa.Table, text_col: str, id_col: str,
                      seg_words: int):
    """Vectorized doc -> non-overlapping word-segment explode.

    Splits each doc into words (``pc.split_pattern``), then rebuilds the
    flat word array's list offsets at ``seg_words`` boundaries and joins
    each run back into one string with ``pc.binary_join`` — no Python
    loop over words. Returns ``(ids, doc_idx, seg_no, segs, nseg)``:
    per-segment doc id / batch-local doc index / in-doc segment number /
    segment string, plus the per-doc segment count.
    """
    texts = pc.fill_null(
        batch.column(text_col).combine_chunks().cast(pa.string()), "")
    words = pc.split_pattern(texts, " ")
    off = np.asarray(words.offsets, dtype=np.int64)
    flat = words.values
    nw = np.diff(off)
    nseg = -(-nw // seg_words)  # ceil; "" splits to [""] so nw >= 1
    total = int(nseg.sum())
    doc_idx = np.repeat(np.arange(len(nw), dtype=np.int64), nseg)
    first = np.cumsum(nseg) - nseg
    seg_no = np.arange(total, dtype=np.int64) - first[doc_idx]
    starts = off[:-1][doc_idx] + seg_words * seg_no
    # each segment's end == the next segment's start (contiguous runs),
    # so the starts themselves are valid list offsets. int64 LARGE-list
    # offsets (ADVICE r02): a batch whose total word count exceeds 2^31
    # must not overflow int32 offset construction.
    seg_offsets = pa.array(np.append(starts, off[-1]), pa.int64())
    segs = pc.binary_join(
        pa.LargeListArray.from_arrays(seg_offsets, flat), " ")
    ids = pc.take(batch.column(id_col).combine_chunks(),
                  pa.array(doc_idx, pa.int64()))
    return ids, doc_idx, seg_no, segs, nseg


def _segment_keys(segs: pa.Array) -> pa.Array:
    """md5 of each segment string — a fixed 16-byte comparator like
    exact_dedup's, so banning is collision-safe (128-bit) at any corpus
    size and matches DuckDB ``md5(seg)`` exactly."""
    return pa.array([md5_hex(s) for s in segs.to_pylist()], pa.string())


def segment_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 8,
    max_docs: int = 1,
    broadcast_cap: int = _BROADCAST_CAP,
    num_partitions: int | None = None,
):
    """Duplicated-span removal (the C4 / RefinedWeb line-dedup shape):
    split every doc into non-overlapping ``seg_words``-word segments,
    ban each segment text that occurs in more than ``max_docs`` DISTINCT
    docs, drop banned segments from every doc and reassemble the
    survivors in order. Boilerplate that repeats across a crawl (nav
    bars, cookie banners, licence footers) disappears corpus-wide while
    each doc keeps its unique prose. The reference's only dedup is
    whole-content drop_duplicates (base.py:474,509); this is the
    intra-document extension a pretraining pipeline needs.

    Output: one row per input doc —
    ``(id_col, text_clean, n_segs:int64, n_removed:int64)`` where
    text_clean is the ' '-joined surviving segments ('' if none).

    Scale shape: pass 1 explodes to per-batch-DISTINCT
    ``(seg md5, doc)`` pairs collapsed to ``(key, n_docs_partial)``
    rows (docs never span batches), so the counting shuffle moves one
    33-byte row per distinct segment per batch; a partial-agg groupby
    then yields banned keys. Pass 2 picks between two plans:

    * banned count <= ``broadcast_cap``: banned-key blocks stay in the
      object store and every worker probes them via the per-process
      cache (``relational._bcast_cached``) — doc text is re-segmented
      in place and NEVER shuffles.
    * larger: slim ``(doc, seg_no, key)`` rows semi-join the banned
      keys, the matches collapse to per-doc removal rows, and a
      tag-union co-partitions those with the docs — text moves through
      exactly one shuffle and the rebuild is coarse-bucketed (P Python
      calls total, every doc of a bucket exploded/reassembled in one
      vectorized pass).

    Null-text docs are dropped by BOTH plans (pinned by pytest): the
    SQL-equivalent ``string_split(NULL)`` drops them, and a doc with no
    text has no segments to dedup.
    """
    import ray
    from ray.data.aggregate import Sum

    from raydoc.ops.relational import _bcast_cached, shuffle_semi_join

    def _partial_counts(batch: pa.Table) -> pa.Table:
        ids, _di, _sn, segs, _ns = _explode_segments(
            batch, text_col, id_col, seg_words)
        pairs = pa.table({"k": _segment_keys(segs), "d": ids})
        pairs = pairs.group_by(["k", "d"]).aggregate([])  # distinct in batch
        part = pairs.group_by("k").aggregate([("d", "count")])
        return pa.table({"k": part.column("k"),
                         "n_part": part.column("d_count").cast(pa.int64())})

    # native Sum aggregate: one shuffle and a block-vectorized combine
    # for the single-fn sum over the corpus-sized distinct-segment key
    # space (r03 note: grouped_agg's finalize is now coarse-bucketed
    # too, so either works; the native aggregate still saves the extra
    # bucket-stamp map stage for this single-fn case).
    counts = ds.map_batches(_partial_counts, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n_part", alias_name="n_docs"))
    banned = counts.filter(expr=f"n_docs > {int(max_docs)}") \
        .select_columns(["k"]).materialize()

    if banned.count() <= broadcast_cap:
        refs = list(banned.to_arrow_refs())
        cache_key = tuple(r.hex() for r in refs) + ("segdedup",)

        def _load_banned():
            tbls = [t for t in ray.get(list(refs)) if t.num_rows]
            if not tbls:
                return pa.array([], pa.string())
            return pc.unique(pa.concat_arrays(
                [c for t in tbls for c in t.column("k").chunks]))

        def _clean(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch.column(text_col)))
            banned_arr = _bcast_cached(cache_key, _load_banned)
            _ids, doc_idx, _sn, segs, nseg = _explode_segments(
                batch, text_col, id_col, seg_words)
            keep = pc.invert(pc.is_in(_segment_keys(segs),
                                      value_set=banned_arr))
            keep_np = np.asarray(keep.to_numpy(zero_copy_only=False))
            return _reassemble(batch, id_col, doc_idx, segs, nseg, keep_np)

        return ds.map_batches(_clean, batch_format="pyarrow")

    # shuffle plan: only slim rows and (once) the doc text move
    def _slim(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(text_col)))
        ids, _di, seg_no, segs, _ns = _explode_segments(
            batch, text_col, id_col, seg_words)
        return pa.table({id_col: ids, "seg_no": pa.array(seg_no),
                         "k": _segment_keys(segs)})

    removals = shuffle_semi_join(
        ds.map_batches(_slim, batch_format="pyarrow"), banned, "k", "k"
    ).select_columns([id_col, "seg_no"])

    def _tag_docs(b: pa.Table) -> pa.Table:
        # null-text docs drop in BOTH plans (ADVICE r02: the plans must
        # agree, and the SQL oracle's string_split(NULL) drops them too)
        b = b.filter(pc.is_valid(b.column(text_col)))
        return pa.table({
            id_col: b.column(id_col),
            text_col: b.column(text_col).cast(pa.string()),
            "seg_no": pa.nulls(b.num_rows, pa.int64()),
        })

    def _tag_removals(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            text_col: pa.nulls(b.num_rows, pa.string()),
            "seg_no": b.column("seg_no").cast(pa.int64()),
        })

    tagged = ds.select_columns([id_col, text_col]) \
        .map_batches(_tag_docs, batch_format="pyarrow") \
        .union(removals.map_batches(_tag_removals, batch_format="pyarrow"))

    # rebuild is coarse-bucketed and VECTORIZED over all docs of a
    # bucket at once (ADVICE r02: the former per-doc map_groups paid
    # one Python call + one _explode_segments per document, exactly on
    # the plan that engages for the largest corpora): sort the bucket
    # by (doc, seg_no), explode every doc row in one pass, and map each
    # removal row to its exploded segment index by searchsorted into
    # the sorted doc-id array + per-doc first-segment offsets.
    def _rebuild_bucket(t: pa.Table, starts: np.ndarray,
                        counts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {id_col: pa.array([], t.schema.field(id_col).type),
                 "text_clean": pa.array([], pa.string()),
                 "n_segs": pa.array([], pa.int64()),
                 "n_removed": pa.array([], pa.int64())})
        valid = pc.is_valid(t.column(text_col))
        doc_rows = t.filter(valid)
        rem = t.filter(pc.invert(valid))
        _ids, doc_idx, _sn, segs, nseg = _explode_segments(
            doc_rows, text_col, id_col, seg_words)
        first = np.cumsum(nseg) - nseg
        doc_ids = doc_rows.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.ones(int(nseg.sum()), dtype=bool)
        if rem.num_rows and len(doc_ids):
            rem_ids = rem.column(id_col).to_numpy(zero_copy_only=False)
            rem_seg = rem.column("seg_no").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(doc_ids, rem_ids)
            pos_c = np.clip(pos, 0, len(doc_ids) - 1)
            ok = (doc_ids[pos_c] == rem_ids) & (rem_seg < nseg[pos_c])
            keep[first[pos_c[ok]] + rem_seg[ok].astype(np.int64)] = False
        return _reassemble(doc_rows, id_col, doc_idx, segs, nseg, keep)

    from raydoc.ops.bucketing import bucketed_sorted_apply

    return bucketed_sorted_apply(
        tagged, [id_col],
        [(id_col, "ascending"), ("seg_no", "ascending")],
        _rebuild_bucket, num_partitions=num_partitions)


def _reassemble(batch: pa.Table, id_col: str, doc_idx: np.ndarray,
                segs: pa.Array, nseg: np.ndarray,
                keep: np.ndarray) -> pa.Table:
    """Join each doc's surviving segments back into one string
    (vectorized ``pc.binary_join`` over rebuilt list offsets)."""
    n_docs = len(nseg)
    keep_per_doc = np.bincount(doc_idx[keep], minlength=n_docs)
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(keep_per_doc)]), pa.int64())
    surv = segs.filter(pa.array(keep))
    if isinstance(surv, pa.ChunkedArray):
        surv = surv.combine_chunks()
    clean = pc.binary_join(pa.LargeListArray.from_arrays(offsets, surv), " ")
    return pa.table({
        id_col: batch.column(id_col),
        "text_clean": clean,
        "n_segs": pa.array(nseg.astype(np.int64)),
        "n_removed": pa.array((nseg - keep_per_doc).astype(np.int64)),
    })
