#!/usr/bin/env python
"""BENCH harness: run the headline queries at $SPARK_GRAFT_SF_DIR and print
one JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Per-query timing = full plan execution to a count-style action (results are
consumed, never collected to the driver in bulk). A warmup pass absorbs JVM
startup and codegen so the numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Default: the FULL registered suite (that's the number BASELINE tracks).
# BENCH_QUICK=1 restricts to one headline query per family for fast loops.
HEADLINE = [
    "pricing_summary",
    "zscore_top_anomalies",
    "rolling_features",
    "top_revenue_customers",
    "minhash_lsh_pairs",
    "cosine_topk",
]


def _host_snapshot() -> dict:
    """One /proc-level reading of host pressure (loadavg + cpu count).
    Taken before AND after the measured loop so a round-close artifact
    carries the evidence needed to separate host drift from plan
    regression — three consecutive rounds of creeper forensics ended in
    "loaded host" without a recorded load (r10 VERDICT item 2)."""
    snap: dict = {"cpus": os.cpu_count()}
    try:
        snap["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        snap["loadavg"] = None
    return snap


def main() -> None:
    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    host_before = _host_snapshot()
    # Warn-tag (don't refuse — the round driver's bench must still produce
    # an artifact): external load at start means the timings will read high
    # through no fault of the plans. The tag rides in the artifact so later
    # forensics can discount the round. Threshold 0.1x cpus (r12, VERDICT
    # item 2): the original 0.25x gate passed the r11 driver run at
    # loadavg 5.37/32 — a run whose Arrow-heavy decodes then inflated up
    # to 5.8x vs floor — i.e. the gate failed on exactly the case it was
    # built for. Measured inflation starts well below a quarter of the
    # cores because the suite itself saturates the machine, so any
    # resident external load steals directly from the measured loop.
    load1 = (host_before.get("loadavg") or [0.0])[0]
    cpus = host_before.get("cpus") or 1
    host_loaded = load1 > 0.1 * cpus
    if host_loaded:
        print(
            f"BENCH HOST LOADED: loadavg1={load1} on {cpus} cpus before "
            "start — timings are suspect; artifact is warn-tagged",
            file=sys.stderr,
        )

    spark = get_spark(app_name="network-iq-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    names = (
        [n for n in HEADLINE if n in QUERIES]
        if os.environ.get("BENCH_QUICK")
        else sorted(QUERIES)
    )

    # warmup: touch every table + run the first query once
    for n in names[:1]:
        try:
            QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # the measured loop will record the failure per-query

    # min of 2 runs per query: single-shot timings on a shared machine swing
    # 30-40%, which would poison cross-round regression comparisons. Queries
    # under the noise floor get up to FIVE runs: JVM jitter alone can fake a
    # 2x "regression" (r5's centered_mavg_volume read 2.07x vs r1 with both
    # sides sub-noise; r6's ewma_hourly read 1.07 s mid-suite min-of-2 vs a
    # measured 0.50 s solo steady state — [1.21, 0.63, 0.60, 0.52, 0.50,
    # 0.51] — so the jitter band extends to ~1.2 s), and cheap extra repeats
    # buy a stable min — they cost little precisely because the query is
    # small.
    #
    # A query that raises is recorded under "errors" and skipped — one broken
    # plan must never cost the round its entire BENCH artifact.
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    subnoise_runs = int(os.environ.get("BENCH_SUBNOISE_RUNS", "5"))
    noise_floor = float(os.environ.get("BENCH_NOISE_FLOOR_SEC", "1.2"))
    # Jittery families get one extra repeat. Iterative queries launch
    # dozens of tiny jobs per run; their wall time is scheduler-sensitive
    # enough that min-of-2 can read 1.6x across rounds (dedup_clusters:
    # 3.37 s mid-suite vs 1.9-2.4 s solo). Arrow-UDF-heavy media plans
    # pay Python-worker pool warm-up on early runs: decoded_image_stats
    # read 2.35 s mid-suite in r7 vs a solo steady-state profile of
    # [9.10, 1.87, 1.70, 1.57, 1.54, 1.45] — min 1.446 s, exactly its r6
    # baseline, so the 1.61x was run-count, not plan (r8 root-cause).
    # The minhash family earns its slot the same way (r9 root-cause): its
    # first run in a JVM that has already compiled ~100 plans costs ~6.5 s
    # vs a ~2.0 s steady state (measured mid-suite: [6.46, 2.71, 2.01,
    # 2.04]), so min-of-2 read 3.39 s in BENCH_r08 — a fake 2.5x
    # "regression" with dedup.py untouched and the r7-vs-r8 code measuring
    # IDENTICAL solo (1.85 s vs 1.75 s steady). multimodal_features showed
    # the same min-of-2 warm-up artifact (driver 1.52 s vs 0.96 s measured
    # steady mid-suite).
    jittery = {
        "dedup_clusters",
        "supplier_pagerank",
        "decoded_image_stats",
        "minhash_lsh_pairs",
        "minhash_lsh_pairs_prod",
        "multimodal_features",
        # r9: same min-of-2 warm-up artifact — the r9 suite runs many more
        # Arrow-batched media plans, so Python-worker churn inflates first
        # runs harder (prog JPEG measured solo [12.47, 5.03, 4.73, 4.74,
        # 4.52] vs a 9.68 s min-of-2 bench reading; steady state is its
        # 4.3-5.0 s baseline band)
        "decoded_jpeg_prog_stats",
        "embedding_near_dup",
        # r10: same first-run pathology, re-measured solo this round —
        # the positional-window family's first run in a hot JVM costs
        # 6-9 s vs a ~1.5 s steady state (duplicate_spans mid-suite
        # min-of-2 read 5.38 s = 3.45x its floor, solo steady
        # [9.26, 2.19, 1.59, 1.46, 1.53, 1.57]); incremental_ann_topk
        # and the Arrow-heavy shifted-audio query show the same shape
        "duplicate_spans",
        "winnow_overlap_pairs",
        "contamination_check",
        "incremental_ann_topk",
        "audio_shifted_near_dup_pairs",
        "incremental_image_dedup_probe",
        "semantic_dedup_scaled",
        "warc_extract_stats",
        # r11: the vectorized GIF codec steady state is ~2.0s but the
        # first run pays ~13s of Arrow/JIT warm-up — same shape as the
        # prog-JPEG entry above
        "decoded_gif_stats",
        # r11: same first-run shape (solo [9.22, 2.52, 2.27, 2.25, 2.22]
        # vs a 3.40 mid-suite min-of-2 = 1.58x its same-day floor)
        "incremental_image_crop_probe",
        "unigram_surprisal",
        # r14 (optimization round): same measured first-run pathology,
        # idle-host 6-run solo profiles on the current tree —
        # ivf_cosine_topk [16.75, 2.88, 1.94, 2.05, 1.76, 1.89] (suite
        # min-of-2 read 5.27 vs a 1.17 tail retime), ivf_centroid_join_topk
        # [4.91, 1.92, 1.68, 1.61, 1.49, 1.65] (suite 5.58 vs 1.14 retime),
        # ab_test_conversion [8.21, 1.40, 1.01, 0.85, 0.83, 0.79] (suite
        # 3.50 vs 0.56 retime — it is also the suite's warm-up query, so
        # its first measured run still rides JVM startup). One extra
        # repeat buys the steady state the retimes keep proving.
        "ivf_cosine_topk",
        "ivf_centroid_join_topk",
        "ab_test_conversion",
        # r15: same measured first-run pathology, idle-host sequence
        # profiles on the current tree (OPTIMIZATION_r15.md "suite-context
        # attribution") — video_frame_shifted_pairs [7.52, 2.40, 2.25,
        # 2.73] after its suite predecessor and [8.65, 2.54] after the
        # census block (suite min-of-2 read 10.53 vs an in-artifact
        # retime of 1.21 s = 0.95x floor); ann_cosine_topk [4.95, 1.60,
        # 1.98] (suite 5.23 vs retime 0.82 = 0.60x floor). A GC before
        # video_frame_shifted does NOT fix the spike (measured 11.98 s
        # first run WITH a preceding GC) — it is JIT/warm-up shaped, so
        # the one-extra-repeat remedy applies, not GC_BEFORE.
        "video_frame_shifted_pairs",
        "ann_cosine_topk",
    }
    # r14 introduced a blanket inter-query System.gc() (measurement-
    # interference fix: localCheckpoint block-cleanup debt landing inside
    # successor queries — an identical 12-query media sequence read 88.2 s
    # without / 61.3 s with the GC). r15 re-measured it with a full 2x2
    # A/B on an idle host, declared in OPTIMIZATION_r15.md (VERDICT r14
    # item 5): full suite (GC, r15 code) 325.0 s vs (no GC, r15 code)
    # 281.9 s — geomean no-GC/GC 0.826 over the 102 common >1.2 s queries,
    # i.e. the blanket full GC taxes the broad suite ~17% (full GC +
    # heap shrink/re-expansion + collected generated classes re-JIT land
    # in the next timed region), while HELPING a concentrated set 3.2-3.5x:
    # the ann PQ/IVF family that runs right after ann_ivfpq_topk's
    # index build (ann_multiprobe 1.34 s with GC vs 4.32 without,
    # ann_pq_adc 1.48 vs 5.12, ann_pq_rerank 1.54 vs 5.04, ann_ivfpq
    # itself 3.56 vs 5.93 — exactly the checkpoint/broadcast-debt
    # pathology the r14 fix targeted). The GC is therefore gated on that
    # evidence-backed set instead of running blanket; retime blocks keep
    # their GC (solo grounding wants a clean heap). BENCH_NO_GC=1
    # disables all GC, BENCH_GC_ALL=1 restores the r14 blanket
    # behaviour — both kept for A/B.
    GC_BEFORE = {
        "ann_ivfpq_topk",
        "ann_multiprobe_topk",
        "ann_pq_adc_topk",
        "ann_pq_rerank_topk",
    }

    def _inter_query_gc(spark, query: str | None = None) -> None:
        if os.environ.get("BENCH_NO_GC"):
            return
        if (
            query is not None
            and query not in GC_BEFORE
            and not os.environ.get("BENCH_GC_ALL")
        ):
            return
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001 — hygiene must never fail the bench
            pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for n in names:
        min_runs = runs + 1 if n in jittery else runs
        best = float("inf")
        done = 0
        _inter_query_gc(spark, n)
        try:
            while done < min_runs or (best < noise_floor and done < subnoise_runs):
                t0 = time.perf_counter()
                QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                done += 1
        except Exception as exc:  # noqa: BLE001 — keep benching the rest
            errors[n] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"BENCH ERROR {n}: {errors[n]}", file=sys.stderr)
            continue
        timings[n] = round(best, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 4)
    _compare_with_last_round(timings, total)
    # Full per-query visibility lives in bench_full.json (committed to the
    # repo each round): at 100+ registered queries the names alone cost
    # 92 * (avg 16.7 chars + 5 for quotes/colon/comma) ~= 2,000 chars, so the
    # complete dict can NEVER fit the driver's ~2000-char stdout tail no
    # matter how the values are encoded. The file carries every timing at
    # full precision plus run metadata; the stdout line below stays the
    # driver-facing summary.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    if os.environ.get("BENCH_QUICK"):
        full_path = os.devnull  # a subset run must not clobber the committed artifact
    elif sf != "0.1":
        # a non-canonical SF run (e.g. the verify recipe's sf0.001 pass)
        # must not clobber the committed sf0.1 artifact either — round 8
        # shipped three commits with sf0.001 numbers in bench_full.json
        # exactly this way before the guard existed
        full_path = os.devnull
    # Drift watchdog (r9, VERDICT item 5): diff this run against the
    # previous committed bench_full.json and embed the comparison IN the
    # artifact, so a drifting query is caught the round it moves instead of
    # at judge time (r8's minhash drift sat unflagged for a full round).
    drift = _drift_vs_committed(timings, full_run=not os.environ.get("BENCH_QUICK"))
    if drift:
        movers = drift.get("moves_gt_1_5x") or {}
        if movers:
            print(
                "BENCH DRIFT >1.5x vs committed bench_full.json: "
                + ", ".join(f"{k}={v}x" for k, v in sorted(movers.items())),
                file=sys.stderr,
            )
        if drift.get("missing_queries"):
            print(
                "BENCH MISSING vs committed bench_full.json (errored or "
                "removed): " + ", ".join(drift["missing_queries"]),
                file=sys.stderr,
            )
    # Slow-creep watchdog (r10, VERDICT item 2): vs_committed only sees one
    # round of movement, so a query drifting <1.5x/round compounds
    # invisibly (three queries reached 1.55-1.82x their earliest records
    # without ever flagging). bench_floor.json pins each query's EARLIEST
    # committed sf0.1 record; the cumulative ratio is compared against
    # that. New queries are appended to the floor file at their first
    # recorded value (only on canonical full runs), existing floors are
    # never rewritten — the file stays "earliest record" by construction.
    # Both the update AND the comparison are gated on canonical full sf0.1
    # runs: a BENCH_QUICK or sf0.001 invocation would otherwise print CREEP
    # warnings against incomparable floors (r10 ADVICE).
    # (update additionally requires an unloaded host: self-seeding a floor
    # from a loaded-host run would pin it high and mask later creep)
    vs_floor = (
        _drift_vs_floor(timings, update=not host_loaded)
        if full_path != os.devnull
        else None
    )
    if vs_floor:
        for key in ("moves_gt_1_5x_vs_floor", "moves_gt_1_8x_vs_floor"):
            if vs_floor.get(key):
                print(
                    f"BENCH CREEP {key.replace('_vs_floor', '')} vs earliest "
                    "record: " + ", ".join(
                        f"{k}={v}x" for k, v in sorted(vs_floor[key].items())
                    ),
                    file=sys.stderr,
                )
    # Auto re-time of alarm-band flags (r12, VERDICT item 2): a >1.8x
    # vs-floor reading taken mid-suite is ambiguous — plan regression vs
    # transient host/warm-up contention — and r10/r11 each burned a round
    # of forensics resolving exactly this. Re-time every alarm query at
    # tail-of-suite with extra repeats and ship BOTH readings in the
    # artifact, so the flag arrives with its own grounding: a retimed
    # ratio back near the floor attributes the suite reading to
    # contention; a retimed ratio still >1.8x is a real regression.
    # r13 (VERDICT item 2): on a warn-tagged (loaded-at-start) run, the
    # 1.5-1.8x warn band is almost certainly the same contention as the
    # alarm band but previously shipped with no self-grounding — the r12
    # driver run had six such entries needing cross-round forensics.
    # Extend the auto-retime to the warn band, but ONLY when the host
    # gate tripped: an idle run's warn band is the cross-round creep
    # watchlist, where a tail-of-suite retime adds nothing the next
    # idle run wouldn't show.
    retime_bands = (
        _retime_targets(vs_floor, host_loaded)
        if vs_floor and full_path != os.devnull and not os.environ.get("BENCH_NO_RETIME")
        else {}
    )
    if retime_bands:
        # clamp to >= 1: zero runs would json.dump float('inf') readings
        # into the artifact (bare Infinity — invalid JSON downstream)
        solo_runs = max(1, int(os.environ.get("BENCH_SOLO_RERUNS", "4")))
        try:
            floors = (
                json.load(open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_floor.json",
                ))).get("floors") or {}
            )
        except (OSError, ValueError):
            floors = {}
        retimed_by_band: dict[str, dict[str, dict]] = {"alarm": {}, "warn": {}}
        for n in sorted(retime_bands):
            retimed = retimed_by_band[retime_bands[n]]
            # r12 ADVICE: the retime itself runs on a possibly-still-
            # contended host; record the loadavg alongside each reading so
            # a "still high" retimed number carries its own load evidence
            try:
                load_now = [round(x, 2) for x in os.getloadavg()]
            except OSError:
                load_now = None
            best = float("inf")
            _inter_query_gc(spark)
            try:
                for _ in range(solo_runs):
                    t0 = time.perf_counter()
                    QUERIES[n](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — keep grounding the rest
                retimed[n] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
                continue
            f = (floors.get(n) or {}).get("sec")
            entry = {
                "suite_sec": timings[n],
                "retimed_sec": round(best, 4),
                "loadavg_at_retime": load_now,
            }
            if f:
                entry["retimed_vs_floor"] = round(best / f, 2)
            retimed[n] = entry
            print(
                f"BENCH RETIME {n}: suite={timings[n]}s retimed={best:.3f}s"
                + (f" ({entry['retimed_vs_floor']}x vs floor)" if f else ""),
                file=sys.stderr,
            )
        if retimed_by_band["alarm"]:
            vs_floor["retimed_gt_1_8x"] = retimed_by_band["alarm"]
        if retimed_by_band["warn"]:
            vs_floor["retimed_warn_band_1_5x"] = retimed_by_band["warn"]
    with open(full_path, "w") as fh:
        json.dump(
            {
                "metric": "operator_suite_sec",
                "value": total,
                "unit": "sec",
                # bump when the watchdog/retime schema gains fields, so
                # tests can scope schema assertions to artifacts the
                # current code actually wrote
                "gate_rev": 13,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "runs": runs,
                "noise_floor_sec": noise_floor,
                "n_queries": len(timings),
                "queries": timings,
                "errors": errors,
                "vs_committed": drift,
                "vs_floor": vs_floor,
                "host": {
                    "before": host_before,
                    "after": _host_snapshot(),
                    "loaded_at_start": host_loaded,
                },
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    # The round driver keeps only a ~2000-char tail of our output and parses
    # the JSON line out of it: r1's 51-query line (1524 chars) parsed, r2's
    # 69-query line (2155 chars) was truncated mid-line and recorded as
    # parsed=null. Emit compactly (no spaces, 2-decimal secs) and, if the
    # registry ever outgrows even that, shed the fastest entries first so the
    # line stays parseable and keeps the queries that dominate the suite.
    def _line(q: dict[str, float]) -> str:
        out = {
            "metric": "operator_suite_sec",
            "value": round(total, 2),
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in q.items()},
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
        }
        if len(q) < len(timings):
            out["full"] = "bench_full.json"  # complete dict, committed in-repo
        if errors:
            out["errors"] = {k: v[:80] for k, v in errors.items()}
        return json.dumps(out, separators=(",", ":"))

    keep = dict(timings)
    line = _line(keep)
    while len(line) > 1900 and keep:
        fastest = min(keep, key=keep.get)
        del keep[fastest]
        line = _line(keep)
    if len(line) > 1900 and errors:
        # errors alone overflow the budget: collapse to a count so the
        # timing contract always survives the driver's tail capture
        errors = {"error_count": str(len(errors))}
        line = _line(keep)
    print(line)


def _drift_vs_committed(timings: dict[str, float], full_run: bool = True) -> dict | None:
    """Comparison block vs the last committed bench_full.json (the
    git-HEAD copy, so the driver's own post-commit rerun of THIS round
    never masks a drift by comparing a run to itself). Returns None when
    no usable prior artifact exists. Queries under the 1.2 s noise floor
    on BOTH sides are exempt from the movers list — JVM jitter alone
    fakes >1.5x there (the standing bench.py policy). ``missing_queries``
    lists names present in the committed artifact but absent from this
    run's timings — a query that regressed into an ERROR or was removed
    produces no drift ratio, which is exactly the silent-regression class
    the watchdog exists to catch."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        blob = subprocess.run(
            ["git", "-C", here, "show", "HEAD:bench_full.json"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout
        prev = json.loads(blob)
    except Exception:  # noqa: BLE001 — no git / no prior artifact: skip
        return None
    prev_q = prev.get("queries") or {}
    if not prev_q:
        return None
    floor = 1.2
    movers = {}
    for n, sec in timings.items():
        p = prev_q.get(n)
        if not p or p <= 0:
            continue
        if sec < floor and p < floor:
            continue
        ratio = sec / p
        if ratio > 1.5:
            movers[n] = round(ratio, 2)
    return {
        "prev_total": prev.get("value"),
        "prev_n_queries": prev.get("n_queries"),
        "new_queries": sorted(n for n in timings if n not in prev_q),
        # only meaningful on a full-suite run: a BENCH_QUICK subset would
        # report every deselected query as "missing"
        "missing_queries": sorted(n for n in prev_q if n not in timings)
        if full_run
        else [],
        "moves_gt_1_5x": movers,
    }


def _retime_targets(vs_floor: dict, host_loaded: bool) -> dict[str, str]:
    """Which vs-floor movers get a tail-of-suite re-time, and under which
    artifact key. Alarm-band (>1.8x) entries ALWAYS retime — that is the
    r12 contract. Warn-band (1.5-1.8x) entries retime only on a
    warn-tagged (loaded-at-start) run: there they are almost certainly
    the same contention as the alarm band and must ship self-grounded
    (r12 driver run: six warn entries, zero grounding); on an idle run
    the warn band is the cross-round creep watchlist and a same-session
    retime adds no information the next idle run wouldn't."""
    bands = {n: "alarm" for n in vs_floor.get("moves_gt_1_8x_vs_floor") or {}}
    if host_loaded:
        for n in vs_floor.get("moves_gt_1_5x_vs_floor") or {}:
            bands.setdefault(n, "warn")
    return bands


def _drift_vs_floor(timings: dict[str, float], update: bool) -> dict | None:
    """Cumulative-creep block vs bench_floor.json (each query's earliest
    committed sf0.1 record; seeded by scripts/bench_floor_seed.py).
    Two thresholds: >1.5x is the watchlist (compounding slower than the
    per-round watchdog can see), >1.8x is the alarm band approaching the
    2x rule. Same 1.2 s noise-floor exemption as vs_committed. With
    ``update`` (canonical full sf0.1 runs only), queries not yet in the
    floor file are appended at this run's value — this code never
    modifies an existing floor.

    Manual re-pin policy (the one sanctioned exception to "earliest
    record"; r12 ADVICE): when a query's registered COMPOSITION changes
    (e.g. transform_dedup_census gaining arms), its old floor measures a
    different plan and comparing against it manufactures fake creep. A
    human (never this code) may then re-pin that floor from an idle-host
    min-of-N run of the NEW shape, and the entry's ``src`` field must
    carry the provenance: what changed, the superseded floor value, and
    the exact shape (e.g. arm count) the new number was measured on — so
    the file stays auditable as "earliest record of the current shape"."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "bench_floor.json")
    try:
        rec = json.load(open(path))
        floors = rec.get("floors") or {}
    except (OSError, ValueError):
        return None
    noise = 1.2
    watch, alarm = {}, {}
    for n, sec in timings.items():
        f = (floors.get(n) or {}).get("sec")
        if not f or f <= 0 or (sec < noise and f < noise):
            continue
        ratio = round(sec / f, 2)
        if ratio > 1.8:
            alarm[n] = ratio
        elif ratio > 1.5:
            watch[n] = ratio
    fresh = sorted(n for n in timings if n not in floors)
    if update and fresh:
        for n in fresh:
            floors[n] = {"sec": timings[n], "src": "self-seeded"}
        rec["floors"] = floors
        with open(path, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
    return {
        "floor_file": "bench_floor.json",
        "self_seeded": fresh,
        "moves_gt_1_5x_vs_floor": watch,
        "moves_gt_1_8x_vs_floor": alarm,
    }


def _compare_with_last_round(timings: dict[str, float], total: float) -> None:
    """Per-query regression report vs the newest BENCH_r{N}.json, to STDERR
    (stdout is reserved for the one-line JSON contract). Makes a single
    query's 2x regression visible even when the suite total hides it."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    # newest round with usable data — a crashed round records parsed=null
    prev, prev_name = {}, None
    for path in reversed(rounds):
        try:
            cand = json.load(open(path))
        except (OSError, ValueError):
            continue
        if "parsed" in cand:  # driver wraps our JSON line under "parsed"
            cand = cand["parsed"] or {}
        if cand.get("queries"):
            prev, prev_name = cand, os.path.basename(path)
            break
    if not prev_name:
        return
    prev_q = prev.get("queries") or {}
    lines = [f"--- vs {prev_name} (suite {prev.get('value')}s -> {total}s) ---"]
    for n in sorted(timings):
        if n not in prev_q or prev_q[n] <= 0:
            lines.append(f"{n:28s} {timings[n]:7.3f}s   (new)")
            continue
        ratio = timings[n] / prev_q[n]
        flag = "  <-- REGRESSED >2x" if ratio > 2.0 else ""
        lines.append(f"{n:28s} {timings[n]:7.3f}s  {ratio:5.2f}x{flag}")
    print("\n".join(lines), file=sys.stderr)


if __name__ == "__main__":
    main()
