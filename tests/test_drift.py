"""Corpus drift: per-token smoothed log-odds (ops/drift.py)."""

import math

import pyarrow as pa

from raydoc.ops.drift import token_drift

A = ["spam spam casino casino casino win", "spam normal words here",
     "casino spam jackpot"]
B = ["normal words here again", "more normal prose words",
     "words about nothing"]


def _ds(texts, parts=2):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": texts}))
    return ds.repartition(parts) if parts else ds


def _ref(top_k, frac_bits=16):
    ca, cb = {}, {}
    for t in A:
        for w in t.strip().lower().split():
            ca[w] = ca.get(w, 0) + 1
    for t in B:
        for w in t.strip().lower().split():
            cb[w] = cb.get(w, 0) + 1
    vocab = sorted(set(ca) | set(cb))
    T1, T2, V = sum(ca.values()), sum(cb.values()), len(vocab)
    rows = []
    for w in vocab:
        c1, c2 = ca.get(w, 0), cb.get(w, 0)
        d = math.floor(math.log(((c1 + 1.0) * (T2 + V))
                                / ((c2 + 1.0) * (T1 + V)))
                       * (1 << frac_bits))
        rows.append((w, c1, c2, d))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:top_k]


class TestTokenDrift:
    def test_matches_reference_and_partition_invariant(self, ray_session):
        ref = _ref(8)
        for parts in (1, 3):
            out = token_drift(_ds(A, parts), _ds(B, parts),
                              top_k=8).take_all()
            got = sorted(((r["w"], r["c1"], r["c2"], r["drift_fp"])
                          for r in out), key=lambda r: (-r[3], r[0]))
            assert got == ref

    def test_spam_tokens_lead(self, ray_session):
        out = token_drift(_ds(A), _ds(B), top_k=3).take_all()
        top = {r["w"] for r in out}
        assert "casino" in top and "spam" in top

    def test_direction_swap(self, ray_session):
        # swapped direction: B-only singletons all tie at ratio
        # (1+1)/(0+1); the alphabetical tiebreak picks them in order
        out = token_drift(_ds(B), _ds(A), top_k=3).take_all()
        got = sorted(((r["w"], r["drift_fp"]) for r in out),
                     key=lambda r: (-r[1], r[0]))
        assert [w for w, _ in got] == ["about", "again", "more"]
        assert len({d for _, d in got}) == 1  # exact integer tie

    def test_empty_side(self, ray_session):
        out = token_drift(_ds(A), _ds([""]), top_k=5).take_all()
        assert len(out) == 5  # everything overrepresented in A
        assert all(r["c2"] == 0 for r in out)
