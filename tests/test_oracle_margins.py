"""Margin guards for the probabilistic-sketch oracles (round-3 advice).

q27/q29/q30 turn sketch recall into a hard hash-equality gate: the oracle
enumerates ALL true pairs / the full-corpus top-1, so the gate is only
sound while every true pair sits far from the decision threshold. The
wide-margin claims in those docstrings are corpus-specific, and the driver
testdata has been regenerated before. These tests re-measure the margins
on the actual corpus so a regeneration that shrinks them produces a
DIAGNOSABLE failure here instead of a silent value-hash mismatch in
CORRECTNESS_r{N}.json.

Also covers the FLOOR-quantization hazard: sim_bp = FLOOR(10000*cos) is
compared across Spark (sequential fold, dot/(sqrt(na)*sqrt(nb))) and
DuckDB (list_cosine_similarity, dot/sqrt(na*nb)); last-ulp differences can
flip FLOOR only when 10000*cos sits essentially ON an integer, so we
assert no emitted pair does.
"""

from __future__ import annotations

import numpy as np
import pytest

from stream_cdc_spark import tables
from stream_cdc_spark.plans import queries as Q

SF = "/root/testdata/sf0.01"

# Margins chosen an order of magnitude above any plausible cross-engine
# float drift, small enough that genuinely threshold-hugging testdata
# trips them.
JACCARD_MARGIN = 0.05       # vs the 0.8 (q27) / 0.5 (q24) gates
COSINE_GATE_MARGIN = 1e-3   # vs the 0.95 near-dup / 9500 bp gates
FLOOR_ULP_MARGIN = 1e-6     # distance of 10000*cos from an integer


def _doc_shingle_sets(spark, k: int = 3) -> dict[int, set]:
    rows = (
        tables.load(spark, SF, "documents").select("doc_id", "text").collect()
    )
    out = {}
    for r in rows:
        # mirror operators.dedup.shingles exactly: split(text, " "),
        # k-grams only when the doc has >= k tokens, distinct
        toks = r["text"].split(" ")
        out[r["doc_id"]] = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    return out


def test_q27_jaccard_threshold_margin(spark):
    """No document pair may sit within JACCARD_MARGIN of the 0.8 gate
    (and none in the dead zone under q24's 0.5 gate either): LSH recall
    is probabilistic near the threshold, and the oracle assumes the true
    pair set is unambiguous."""
    sets = _doc_shingle_sets(spark)
    ids = sorted(sets)
    # exact same all-pairs Jaccard the oracle computes, driver-side (the
    # sf0.01 corpus is a few hundred docs — this is the oracle's own cost)
    near_gate = []
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            if not inter:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            for gate in (0.8, 0.5):
                if abs(j - gate) < JACCARD_MARGIN:
                    near_gate.append((a, b, round(j, 4), gate))
    assert not near_gate, (
        f"regenerated testdata put pairs within {JACCARD_MARGIN} of a "
        f"Jaccard gate — the q24/q27 oracles are no longer margin-safe: "
        f"{near_gate[:5]}"
    )


def _embeddings(spark) -> tuple[np.ndarray, np.ndarray]:
    rows = (
        tables.load(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_q29_q30_cosine_gate_and_floor_margins(spark):
    """(a) The corpus' best genuine pair must stay far under the 0.95
    near-dup gate, and every planted pair far above it, so top-1/near-dup
    sets are unambiguous. (b) No pair that the queries emit may have
    10000*cos within FLOOR_ULP_MARGIN of an integer, or FLOOR could
    disagree across engines on the last ulp."""
    ids, mat = _embeddings(spark)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / norms
    sims = unit @ unit.T
    np.fill_diagonal(sims, -1.0)
    best_genuine = float(sims.max())
    assert best_genuine < 0.95 - 50 * COSINE_GATE_MARGIN, (
        f"genuine corpus pair at cosine {best_genuine:.4f} approaches the "
        f"0.95 gate — q29/q30's 'planted pairs are the only true answer' "
        f"assumption is broken"
    )

    # planted rows: +0.002 per element, exactly as q29/q30 build them
    planted = mat[ids < 25] + 0.002
    p_unit = planted / np.linalg.norm(planted, axis=1, keepdims=True)
    p_sims = np.einsum("ij,ij->i", p_unit, unit[ids < 25])
    assert p_sims.min() > 0.95 + COSINE_GATE_MARGIN, (
        f"planted pair cosine {p_sims.min():.6f} is within margin of the "
        f"0.95 gate"
    )

    # FLOOR-boundary scan over every value the queries quantize: planted
    # pair sims (emitted by both q29 and q30) and the 9500 bp output gate
    scaled = 10000.0 * p_sims
    dist_to_int = np.abs(scaled - np.round(scaled))
    assert dist_to_int.min() > FLOOR_ULP_MARGIN, (
        f"a quantized similarity sits {dist_to_int.min():.2e} from an "
        f"integer — FLOOR(10000*cos) may flip between engines"
    )
    assert np.abs(scaled - 9500.0).min() > 1.0, (
        "an emitted sim_bp hugs the 9500 output gate"
    )


def test_plant_offset_guard_fires_on_collision(spark):
    """q28/q29/q30 fail fast (not hash-mismatch) if regenerated testdata
    outgrows the planted-row id offset."""
    df = spark.range(0, 1).select((Q.F.col("id") + 200_000).alias("doc_id"))
    with pytest.raises(ValueError, match="collides"):
        Q._checked_plant_offset(df, "doc_id", "synthetic://big", "documents")


def test_plant_offset_guard_passes_and_caches(spark):
    d = tables.load(spark, SF, "documents").select("doc_id")
    assert Q._checked_plant_offset(d, "doc_id", SF, "documents") == Q._PLANT_OFFSET
    # second call answers from the cache (no further Spark job)
    assert ("documents" in t for t in Q._max_id_cache)
    assert Q._checked_plant_offset(d, "doc_id", SF, "documents") == Q._PLANT_OFFSET


def test_q43_q44_ivf_distance_floor_margins(spark):
    """dist_bp = FLOOR(10000 * squared_distance) is compared across
    engines in the IVF queries; the comparison is safe because Spark's
    zip_with/aggregate fold and DuckDB's list_dot_product both accumulate
    LEFT-TO-RIGHT, yielding bit-identical doubles. The residual hazard is
    an engine upgrade changing its accumulation order, which only bites
    where a value hugs an integer boundary — so scan every quantized
    distance in the SAME sequential order the engines use and assert none
    sits within 1e-9 of an integer without being exactly integral.
    (numpy's pairwise/SIMD reductions round differently and flag false
    boundaries — measured: 4 numpy 'hazards', 0 sequential ones.)"""
    ids, mat = _embeddings(spark)

    def dot_seq(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    vecs = [list(map(float, row)) for row in mat]
    cents = [(int(i), v) for i, v in zip(ids, vecs) if i % 100 == 0]
    hazards = []
    for vid, v in zip(ids, vecs):
        dv = dot_seq(v, v)
        for cid, c in cents:
            val = 10000.0 * (dv - 2.0 * dot_seq(v, c) + dot_seq(c, c))
            frac = abs(val - round(val))
            if 0 < frac < 1e-9:
                hazards.append((int(vid), cid, val))
    assert not hazards, (
        f"IVF distances sit within 1e-9 of a FLOOR boundary — dist_bp is "
        f"fragile to engine accumulation-order changes: {hazards[:5]}"
    )


def test_q24_q27_jaccard_ppm_floor_margins(spark):
    """The shingle queries emit FLOOR(1e6 * shared/union) (and gate on the
    raw ratio). Mathematically-integral ratios are exact in IEEE double
    and safe; scan every co-shingled pair for NON-integral ratios hugging
    an integer ppm boundary."""
    sets = _doc_shingle_sets(spark)
    ids = sorted(sets)
    hazards = []
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            if not inter:
                continue
            union = len(sa) + len(sb) - inter
            v = 1_000_000.0 * inter / union
            if (1_000_000 * inter) % union == 0:
                continue  # exactly integral -> bit-stable in both engines
            if abs(v - round(v)) < 1e-9:
                hazards.append((a, b, v))
    assert not hazards, (
        f"jaccard ppm values hugging a FLOOR boundary: {hazards[:5]}"
    )
