"""Generate SCALING.md: per-query wall time across scale factors.

The 100 TB question is not "how fast at sf0.1" but "how does time
grow with data". This probe times every bench headliner (noop sink,
min-of-2 after a warm pass) at sf0.001 / sf0.01 / sf0.1 — plus sf1
when the locally-generated decade-up dataset exists (build it with
``python tools/gen_sf1.py``; /root/testdata is read-only and tops
out at sf0.1) — and reports the per-decade growth ratios. Linear
work should show ratios well under 10 locally (fixed per-query
overhead dominates small SFs); anything approaching or exceeding
~10 on the last measured step is flagged for review.

Usage: python tools/scale_probe.py   (writes SCALING.md; ~6 min
without sf1, ~15 with)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

HISTORY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scaling_history.jsonl",
)
MERGE_SESSIONS = 2  # SCALING.md cells = min over the last N sessions

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata", "sf1",
)
SF10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata", "sf10",
)
FLAG_RATIO = 12.0  # growth on the final 10× step that warrants review

# durable analysis that must survive regeneration (appended verbatim):
# per-row draws are single-session min-of-2 — read outliers against
# these standing notes before treating a flag as a regression
STANDING_NOTES = [
    "Standing notes (tools/scale_probe.py::STANDING_NOTES):",
    "",
    "- r12: the tpch_q21 / text_quality cells PREDATE the r12",
    "  rewrites (one-corpus-exchange q21; single-evaluation +",
    "  translate-count text_quality) — same-session isolated A/Bs",
    "  measured q21 sf10 10.7→5.7 s and text_quality sf10",
    "  23.3→2.6 s, sf1 3.12→1.88 s (PERF.md round-12; row identity",
    "  asserted). text_quality's 10.1× sf1→sf10 step was the regex",
    "  class-count passes over the long-document tail, now gone.",
    "  The r12 full-probe session was cut short by wall-clock (host",
    "  ~2× degraded); the next probe session refreshes these cells.",
    "- r11: the sf10 column is FULL-WIDTH (every benched row) — the",
    "  full 62-query probe session carries heavier per-session load",
    "  than the r10 18-row sessions, so single-session sf10 cells",
    "  sit higher in the host noise band; the min-merge discipline",
    "  (per-cell min over the last 2 same-layout sessions) is what",
    "  makes the table comparable. decontaminate_fuzzy's sf10 cell",
    "  drew 11.5/15.6/16.3 s across three same-day draws (noise",
    "  band); its best-draw decade step is 3.6x — the bipartite",
    "  LSH candidate growth tracks dup mass, same law as",
    "  dedup_minhash. span_dedup's 6.5 s cell reflects the r11",
    "  invariant-5 fix (was 9.3 s at r10; solo warm draws 7.1 s).",
    "- tpch_q3 at sf10 crosses the designed broadcast→shuffle-join",
    "  transition: the date-filtered orders side (~7M rows) outgrows",
    "  the broadcast threshold, so lineitem⋈orders becomes a",
    "  SortMergeJoin (customer stays broadcast). This is the plan",
    "  the 100 TB design EXPECTS (facts shuffle, dims broadcast);",
    "  the mixed shape is pinned by tests/test_plans.py::",
    "  test_q3_sf10_transition_shape_smj_facts_broadcast_dims. Since",
    "  r10 the sf10 column is measured min-of-2 AFTER an untimed",
    "  warm execution, so one-time cold costs (page-cache fill, SMJ",
    "  JIT — the r9 probe's 17.5 s draw) no longer land in the",
    "  table.",
    "- ann_topk and text_quality-family rows are declared outliers:",
    "  ann_topk is the brute-force ground-truth baseline (product",
    "  surface = LSH/IVF paths), and the token-bound linear scans",
    "  are data-linear by design.",
    "- THIRD-decade spot rows (sf30 tiling — documents ×3 +",
    "  embeddings ×3, tools/gen_sf30.py; min-of-2 after warm, r10):",
    "  ngram_novelty 15.4 s (sf10→sf30 2.7× on 3× data — linear",
    "  token work); dedup_clusters 46.6 s (2.8× on 3×; edges",
    "  2.88M → 9.48M = ×3.3 with the CC stage ×2.1 — sublinear in",
    "  edges, counted in PERF.md's cc_decomp table);",
    "  semantic_clusters 12.6 s (2.6× on 3× vectors);",
    "  ivf_topk_shuffle 8.7 s (2.0× on 3× — candidate pairs grow",
    "  ×9 under fixed cells, absorbed by the bucket-grouped Arrow",
    "  kernel); ann_lsh_topk_shuffle 2.4 s (1.3×). Text-dedup",
    "  family sf10→sf30 steps (same-session pairs, so the ratios",
    "  are noise-consistent even when a draw's absolutes sit high",
    "  in the host band): dedup_minhash 3.5×, minhash_lsh_topk",
    "  2.5×, span_dedup 2.3×, source_overlap 2.7×,",
    "  quality_repetition 1.2× — every step ≤ 3.5× on 3× data.",
    "  Oracle spot-checks at sf30: doc_fingerprint,",
    "  quality_repetition, ngram_novelty — 3/3 hash-green at 1.5M",
    "  docs — plus ann_lsh_topk_shuffle (24,000 rows) and",
    "  semantic_clusters (61,080 rows) at 96k vectors — 5/5, three",
    "  decades above the gate SF.",
    "- At sf30 the capped-probe broadcast entries (ivf_topk,",
    "  ann_lsh_topk: corpus/50 = 1920 probes > max_probes=1024)",
    "  FAIL LOUDLY by design — the probe contract's documented",
    "  regime transition to the _shuffle variants, which the sf30",
    "  rows above measure.",
]

# the SECOND decade (sf10, tools/gen_sf10.py) is probed FULL-WIDTH
# since r11 (verdict item 3: every SCALING.md row carries an sf10
# cell, so a super-linear step anywhere in the benched set is
# attributed, not assumed). Through r10 only the scale-path
# headliners were probed; the r11 run found the remainder's steps
# unremarkable, at the cost of a longer probe session.
SF10_SET = None  # None = all benched queries


def main() -> None:
    from bench import HEADLINERS, LONG_TAIL
    HEADLINERS = HEADLINERS + LONG_TAIL  # tools sweep the full benched set
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import gc_hygiene, get_spark

    sfs = list(SFS)
    have_sf1 = os.path.isdir(SF1)
    if have_sf1:
        sfs.append(SF1)
    else:
        print("# sf1 absent — run tools/gen_sf1.py to probe one decade up",
              file=sys.stderr)
    have_sf10 = have_sf1 and os.path.isdir(SF10)
    if have_sf10:
        sfs.append(SF10)
    elif have_sf1:
        print("# sf10 absent — run tools/gen_sf10.py for the second decade",
              file=sys.stderr)

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    def run(name, sf):
        df = REGISTRY[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()

    for name in HEADLINERS:  # codegen warm pass
        run(name, SFS[0])

    measured_by_name: dict[str, list] = {}
    for name in HEADLINERS:
        times = []
        for sf in sfs:
            if sf == SF10 and SF10_SET is not None and name not in SF10_SET:
                times.append(None)
                continue
            try:
                # dead checkpoint blocks from earlier rows otherwise
                # pile up across the 62-query session and read as
                # fake superlinear cells (session.gc_hygiene)
                gc_hygiene(spark)
                if sf == SF10:
                    # the second decade gets an UNTIMED warm execution
                    # first: a query's first sf10 run in a session can
                    # pay one-time costs (page-cache fill of the 2.3 GB
                    # tiling, JIT of the cold SMJ/sort paths) that land
                    # on BOTH min-of-2 draws — the r9 probe recorded
                    # tpch_q3 at 17.5 s this way where warm draws are
                    # 2.7-4.9 s (VERDICT r9 item 1)
                    run(name, sf)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    run(name, sf)
                    best = min(best, time.perf_counter() - t0)
                times.append(best)
            except Exception as ex:
                # a raising query (e.g. a documented cap/regime
                # transition at a new SF) must not kill the session —
                # record the hole and keep probing
                print(f"# {name} @ {os.path.basename(sf)}: RAISED "
                      f"{type(ex).__name__}: {str(ex)[:160]}",
                      file=sys.stderr)
                times.append(None)
        measured_by_name[name] = times
        print(f"# {name}: {[None if t is None else round(t, 3) for t in times]}",
              file=sys.stderr)

    # ---- cross-session noise discipline (cf. tools/bench_check.py):
    # one session's min-of-2 can still land inside a multi-minute
    # host noise band (r10: minhash_lsh_topk drew 15.4/15.4 s at sf1
    # in one clean run where adjacent sessions draw 5.3-6.0 s), so
    # the SHIPPED table takes the per-cell MIN over the last
    # MERGE_SESSIONS probe sessions with the same SF layout — run
    # the probe twice at the same HEAD per round. Raw per-session
    # draws append to scaling_history.jsonl (provenance).
    sf_names = [os.path.basename(p) for p in sfs]
    entry = {"sfs": sf_names, "queries": {
        k: [None if t is None else round(t, 3) for t in v]
        for k, v in measured_by_name.items()
    }}
    with open(HISTORY, "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    render(list(HEADLINERS))


def _load_history() -> list[dict]:
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def render(order: list[str]) -> None:
    """Compose SCALING.md from the last MERGE_SESSIONS history
    entries with the newest entry's SF layout (per-cell min)."""
    history = _load_history()
    if not history:
        raise SystemExit("scale_probe: no scaling_history.jsonl to render")
    sf_names = history[-1]["sfs"]
    mergeable = [h for h in history if h.get("sfs") == sf_names]
    sessions = mergeable[-MERGE_SESSIONS:]
    merged: dict[str, list] = {}
    for h in sessions:
        for name, times in h["queries"].items():
            if name not in merged:
                merged[name] = list(times)
                continue
            cur = merged[name]
            if len(cur) != len(times):
                merged[name] = list(times)
                continue
            merged[name] = [
                min(a, b) if (a is not None and b is not None) else
                (a if b is None else b)
                for a, b in zip(cur, times)
            ]

    rows = []
    for name in order:
        if name not in merged:
            continue
        times = merged[name]
        measured = [t for t in times if t is not None]
        ratios = [
            measured[i + 1] / measured[i] if measured[i] else float("nan")
            for i in range(len(measured) - 1)
        ]
        flag = " ⚠" if ratios and ratios[-1] >= FLAG_RATIO else ""
        cells = " | ".join(
            "—" if t is None else f"{t:.3f}" for t in times
        )
        rcells = " | ".join(f"{r:.1f}×" for r in ratios)
        if len(measured) < len(times):
            rcells += " | —"
        rows.append(f"| {name} | {cells} | {rcells}{flag} |")

    sf_heads = " | ".join(f"{n} s" for n in sf_names)
    ratio_heads = " | ".join(
        f"×({sf_names[i][2:]}→{sf_names[i+1][2:]})"
        for i in range(len(sf_names) - 1)
    )
    lines = [
        "# SCALING — per-query wall time vs scale factor",
        "(auto-generated by tools/scale_probe.py; noop sink, min-of-2",
        f"per session, per-cell min over the last {len(sessions)} probe",
        "session(s) — cross-session noise discipline, raw draws in",
        "scaling_history.jsonl; warm session; local[32])",
        "",
        "Each SF step is 10× the data (sf1 is the locally-tiled",
        "decade-up set from tools/gen_sf1.py — key-shifted copies,",
        "preserved join selectivities and dup rates). Ratios well",
        "under 10× mean fixed overhead still dominates (good",
        "headroom); ratios near or above ~10× mean the query is",
        f"data-bound locally — flagged (⚠) above {FLAG_RATIO}× on the",
        "final step.",
        "",
        f"| query | {sf_heads} | {ratio_heads} |",
        "|---" * (1 + len(sf_names) + len(sf_names) - 1) + "|",
        *rows,
        "",
        *STANDING_NOTES,
    ]
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote SCALING.md ({len(rows)} queries, "
          f"min over {len(sessions)} session(s))")


if __name__ == "__main__":
    if "--rebuild" in sys.argv:
        # re-render from history without re-measuring (e.g. after a
        # second probe session, or a STANDING_NOTES edit)
        from bench import HEADLINERS, LONG_TAIL
        render(list(HEADLINERS) + list(LONG_TAIL))
    else:
        main()
