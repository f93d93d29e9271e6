"""dedup_clusters decade-step decomposition (VERDICT r9 item 5).

dedup_clusters' sf1→sf10 step was 8.4× (28.6 s) in the r9 probe —
under the ⚠ flag but the steepest of the heavy family. This tool
stage-isolates the pipeline at each SF so the step is ATTRIBUTED:

  A. candidate-pair generation — shingles → minhash signatures →
     banded LSH pairs, timed to an EAGER materialization, with the
     edge count (dup mass) recorded;
  B. connected components — hybrid CC over the already-materialized
     edge frame (so stage B never re-runs stage A).

If stage A times track corpus size and stage B times track EDGE
count, the decade step is dup-mass growth riding the designed cost
law (fine). If stage B grows faster than edges — or A+B measured
apart is much cheaper than the fused query — something re-scans
(fix). Prints a PERF.md-ready table.

Usage: python tools/cc_decomp.py [sf_dir ...]
       (default: testdata sf0.1, .localdata/sf1, .localdata/sf10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = [
    "/root/testdata/sf0.1",
    os.path.join(HERE, ".localdata", "sf1"),
    os.path.join(HERE, ".localdata", "sf10"),
]


def main() -> None:
    from rstreams_spark.functions.dedup import (
        connected_components_hybrid, doc_shingles, lsh_band_pairs,
        minhash_signature,
    )
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.dedupq import (
        BANDS, LSH_BUCKET_CAP, NUM_PERM,
    )
    from rstreams_spark.session import gc_hygiene, get_spark, oha_session

    sfs = sys.argv[1:] or [p for p in DEFAULT_SFS if os.path.isdir(p)]
    spark = oha_session(get_spark("cc-decomp"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).count()

    rows = []
    for sf in sfs:
        label = os.path.basename(sf.rstrip("/"))

        def build_pairs():
            docs = t(spark, sf, "documents")
            sh = doc_shingles(docs, "text", 2)
            return lsh_band_pairs(
                minhash_signature(sh, NUM_PERM), NUM_PERM, BANDS,
                bucket_cap=LSH_BUCKET_CAP,
            )

        # warm pass (page cache + codegen), then min-of-2 per stage —
        # single draws land inside this host's noise bands (a first
        # cut drew stage A at 53 s where the warm floor is 9.5 s)
        gc_hygiene(spark)
        build_pairs().write.format("noop").mode("overwrite").save()
        t_pairs = float("inf")
        pairs = None
        for _ in range(2):
            # superseded checkpoints free with the dropped reference
            # (ContextCleaner) — DataFrame.unpersist() does NOT
            # release localCheckpoint blocks (r10 advice)
            t0 = time.perf_counter()
            pairs = build_pairs().localCheckpoint(eager=True)
            t_pairs = min(t_pairs, time.perf_counter() - t0)
        n_edges = pairs.count()

        t_cc = float("inf")
        n_nodes = 0
        for _ in range(2):
            # lazy checkpoint + count = ONE materializing job
            # (invariant 11's idiom), and the node count comes from
            # the TIMED execution instead of an untimed third re-plan
            t0 = time.perf_counter()
            cc = connected_components_hybrid(pairs).localCheckpoint(
                eager=False
            )
            n_nodes = cc.count()
            t_cc = min(t_cc, time.perf_counter() - t0)

        rows.append((label, t_pairs, n_edges, t_cc, n_nodes))
        print(f"# {label}: pairs {t_pairs:.2f} s ({n_edges} edges), "
              f"cc {t_cc:.2f} s ({n_nodes} labeled nodes)",
              file=sys.stderr)

    print("| sf | stage A pairs s | edges | stage B cc s | labeled nodes |")
    print("|---|---|---|---|---|")
    for label, tp, ne, tc, nn in rows:
        print(f"| {label} | {tp:.2f} | {ne} | {tc:.2f} | {nn} |")
    for i in range(1, len(rows)):
        p, c = rows[i - 1], rows[i]
        print(f"# step {p[0]}→{c[0]}: pairs ×{c[1]/p[1]:.1f}, "
              f"edges ×{c[2]/max(p[2],1):.1f}, cc ×{c[3]/p[3]:.1f}, "
              f"nodes ×{c[4]/max(p[4],1):.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
