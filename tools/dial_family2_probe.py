"""Second-family probe for the deep-dial edge (r17, VERDICT r16 order 3).

The escalating widen dial's 0.34 deep edge was calibrated on ONE corpus
family — the gate's orthogonal-mutation replicas (f20/f30/f50,
tools/ann_crossover.derive) — and the measured void around the edge
((0.333, 0.354)) plus its single 16x-needing point (covered = 0.333)
are all that family's shape. This tool measures covered-vs-recovery at
4x/8x/16x on a DIFFERENT family: seeded Gaussian mixtures with
controllable cluster count and overlap, so the cluster geometry (few
broad clusters vs many overlapping ones) — not the replica recipe —
drives the ADC spread.

The committed trigger (SCALE_ann_r16.md §4 / VERDICT r16 order 3): if
ANY query with covered < PQ_ADAPT_DEEP_COVER reads recall < 1.0 at the
16x deep re-rank, the next dial is shortlist-by-covered-magnitude; if
none does across both families, the dial is calibration-complete.

Reuses tools/dial_band_probe.study — the numpy replication of the
shipped serving arithmetic (books via ann_index.pq_codebooks, ADC per
_adc_arrays_np, the covered-gap fire rule, floor/4x/8x/16x re-ranks).

Usage: python tools/dial_family2_probe.py [name ...]
       (default: all four settings below)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dial_band_probe import study  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (clusters, sigma, n): few/broad vs many/tight vs many/overlapping —
# chosen to bracket the mutation family's geometry from both sides.
SETTINGS: dict[str, tuple[int, float, int]] = {
    "c4_wide": (4, 0.30, 40_000),
    "c16_mid": (16, 0.15, 40_000),
    "c64_tight": (64, 0.08, 40_000),
    "c64_overlap": (64, 0.35, 40_000),
}


def gen(name: str, clusters: int, sigma: float, n: int, seed: int = 1700) -> str:
    """Deterministic GMM corpus under .scale_data/gmm_<name>; vec_id
    0..n-1 (ids < N_QUERIES are the probe queries, spread round-robin
    across clusters by construction)."""
    dst = os.path.join(REPO, ".scale_data", f"gmm_{name}")
    out = os.path.join(dst, "embeddings.parquet")
    if os.path.isfile(out) and pq.read_metadata(out).num_rows == n:
        return dst
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    cents = rng.normal(0.0, 1.0, (clusters, 64))
    cents /= np.sqrt((cents * cents).sum(axis=1))[:, None]
    assign = np.arange(n) % clusters  # queries span clusters
    x = cents[assign] + rng.normal(0.0, sigma, (n, 64))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    x.astype(np.float32).tolist(), pa.list_(pa.float32())
                ),
            }
        ),
        out,
    )
    return dst


def main() -> int:
    names = sys.argv[1:] or list(SETTINGS)
    from mapreduce_hadoop_spark.operators.similarity import (
        PQ_ADAPT_DEEP_COVER,
        PQ_ADAPT_WIDEN,
        PQ_ADAPT_WIDEN_DEEP,
    )
    from mapreduce_hadoop_spark.session import get_spark

    # Probe depths are keyed by EXPLICIT multiplier since r18 (ADVICE
    # r17: the old recall_widened/_widened8 keys silently relabeled when
    # PQ_ADAPT_WIDEN moved); the shipped dial's depths are read via the
    # constants so this consumer always evaluates the deployed widths.
    k_wide = f"recall_x{PQ_ADAPT_WIDEN}"
    k_deep = f"recall_x{PQ_ADAPT_WIDEN_DEEP}"

    spark = get_spark("dial-family2-probe", master="local[8]", shuffle_partitions=8)
    trigger_hits = []
    for name in names:
        c, sigma, n = SETTINGS[name]
        sf_dir = gen(name, c, sigma, n)
        res = study(spark, sf_dir)
        cov = [r["covered"] for r in res]
        deep = [r for r in res if r["covered"] < PQ_ADAPT_DEEP_COVER]
        unrec = [r for r in deep if r[k_deep] < 1.0]
        trigger_hits += [(name, r) for r in unrec]
        # Lossy NO-fires that widening would recover: the fire threshold
        # itself has a miss (found at covered 0.389, n=200k, this family).
        thr_miss = [
            r
            for r in res
            if not r["fired"]
            and r["recall_fixed"] < 1.0
            and r[k_wide] > r["recall_fixed"]
        ]
        print(
            f"{name} (C={c}, sigma={sigma}, n={n}): covered "
            f"{min(cov):.3f}-{max(cov):.3f}, deep-band {len(deep)}/10, "
            f"16x-unrecovered {len(unrec)}/10, "
            f"threshold-miss (lossy no-fire, widening helps) {len(thr_miss)}/10"
        )
        for r in res:
            print("   ", r)
    print(
        "TRIGGER:",
        "shortlist-by-covered-magnitude NEEDED — deep fires below 1.0 at 16x: "
        + str([(n, r["query"], r["covered"], r[k_deep]) for n, r in trigger_hits])
        if trigger_hits
        else "none — every covered<{:.2f} query recovers fully at 16x "
        "on this family".format(PQ_ADAPT_DEEP_COVER),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
