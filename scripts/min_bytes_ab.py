#!/usr/bin/env python
"""Interleaved A/B for the r14 min_bytes audit (VERDICT item 4): for one
representative query per ensure_parallelism caller family, alternate

  A: the family's sites with every floor STRIPPED (min_bytes=0 — the
     repartition fires at bench SF)
  B: the family's sites guarded with GUARD_MIN_BYTES (no exchange under
     the 4 MB floor -> the map runs on the scan's own splits)

within ONE Spark session, and compare minima — the interleaving cancels
host drift (the r10-r12 lesson; absolute numbers on this host are not
comparable across minutes). B wins => the exchange can't pay for itself
at small input and the site should take the guard; A wins => the per-row
work needs the spread even at 600 KB and the site keeps the
unconditional repartition.

BOTH arms monkeypatch the family module's ensure_parallelism binding
(and the operators-module attribute, for call-site imports): A forces
min_bytes=0 (the pre-guard baseline — after the r14 edits shipped,
"as-shipped" would silently measure guard-vs-guard and print
meaningless 'guard' verdicts on re-runs), B forces
min_bytes=GUARD_MIN_BYTES. Measurement only; shipped edits are made
per-site afterwards.

Run: python scripts/min_bytes_ab.py [rounds]   (default 4)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# family -> (module with the call sites, representative registered query)
FAMILIES = [
    # NOTE: representatives measured for the r14 table; on re-runs the
    # A arm strips every floor in the family's module, so already-
    # guarded sites are re-compared against their true unguarded shape
    ("text/cheap-stats", "network_iq_spark.operators.text", "token_stats"),
    ("text/digest", "network_iq_spark.operators.text", "doc_fingerprints"),
    ("text/lang-profile", "network_iq_spark.operators.text", "lang_id"),
    ("text/tokenize-heavy", "network_iq_spark.operators.text", "kn_trigram_surprisal"),
    ("dedup/simhash", "network_iq_spark.operators.dedup", "simhash_pairs"),
    ("dedup/grid-expr", "network_iq_spark.operators.dedup", "audio_resampled_near_dup_pairs"),
    ("dedup/minhash", "network_iq_spark.operators.dedup", "minhash_lsh_pairs"),
    ("spans/windows", "network_iq_spark.operators.spans", "duplicate_spans"),
    ("packing/spans", "network_iq_spark.operators.packing", "span_corruption_manifest"),
    ("similarity/recenter", "network_iq_spark.operators.similarity", "ivf_int_recenter_stats"),
    ("queries/cosine", "network_iq_spark.queries.similarity_q", "cosine_topk"),
    ("queries/warc", "network_iq_spark.queries.text_q", "warc_extract_stats"),
    ("queries/codec", "network_iq_spark.queries.media", "decoded_gif_stats"),
]


def main() -> None:
    import importlib

    from network_iq_spark import operators as OPS
    from network_iq_spark.registry import QUERIES
    from network_iq_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="min-bytes-ab")
    spark.sparkContext.setLogLevel("ERROR")
    orig = OPS.ensure_parallelism

    def unguarded(df, target=None, min_bytes=0):
        return orig(df, target, 0)

    def guarded(df, target=None, min_bytes=0):
        return orig(df, target, max(min_bytes, OPS.GUARD_MIN_BYTES))

    arms = {"A": unguarded, "B": guarded}

    try:
        la = os.getloadavg()[0]
    except OSError:
        la = None
    print(f"sf_dir={SF} rounds={rounds} loadavg1={la}", file=sys.stderr)
    print("| family | representative | A min (s) | B min (s) | B/A | action |")
    print("|---|---|---|---|---|---|")
    for fam, modname, qname in FAMILIES:
        mod = importlib.import_module(modname)
        has_binding = getattr(mod, "ensure_parallelism", None) is not None
        run = QUERIES[qname]
        # warm both arms once (JVM/codegen/Arrow pools)
        run(spark, SF).write.format("noop").mode("overwrite").save()
        mins = {"A": float("inf"), "B": float("inf")}
        for _ in range(rounds):
            for arm in ("A", "B"):
                OPS.ensure_parallelism = arms[arm]
                if has_binding:
                    mod.ensure_parallelism = arms[arm]
                try:
                    t0 = time.perf_counter()
                    run(spark, SF).write.format("noop").mode("overwrite").save()
                    mins[arm] = min(mins[arm], time.perf_counter() - t0)
                finally:
                    OPS.ensure_parallelism = orig
                    if has_binding:
                        mod.ensure_parallelism = orig
        ratio = mins["B"] / mins["A"]
        action = "guard" if ratio <= 1.02 else ("keep" if ratio > 1.10 else "either")
        print(
            f"| {fam} | `{qname}` | {mins['A']:.3f} | {mins['B']:.3f} "
            f"| {ratio:.2f} | {action} |"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
