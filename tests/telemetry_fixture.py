"""Telemetry fixture per FIXTURES.md §A: 5 cells × 120 hourly rows with the
edge cases the reference-parity goldens need — nulls, a constant-metric hour
(std==0 guard), sub-zero latency (cleansing filter), out-of-range geo."""

from __future__ import annotations

import numpy as np
import pandas as pd

CELLS = [f"CELL-{i:03d}" for i in range(1, 6)]


def telemetry_pdf(seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2025-07-01", periods=120, freq="h")
    rows = []
    for cell_i, cell in enumerate(CELLS):
        for t in ts:
            rows.append(
                {
                    "timestamp": t,
                    "cell_id": cell,
                    "lat": 32.7 + rng.normal(0, 0.05),
                    "lon": -97.0 + rng.normal(0, 0.05),
                    "rsrp_dbm": rng.uniform(-113, -79),
                    "rsrq_db": rng.uniform(-18.5, 1.8),
                    "sinr_db": rng.uniform(-5.1, 23.1),
                    "throughput_mbps": rng.uniform(2.4, 254.9),
                    "latency_ms": rng.uniform(18, 76),
                    "jitter_ms": rng.uniform(0, 20.5),
                    "drop_rate": rng.uniform(0, 3.85),
                    "tech": str(rng.choice(["4G", "5G"])),
                    "band": str(rng.choice(["B2", "B66", "n41", "n77"])),
                }
            )
    pdf = pd.DataFrame(rows)
    # nulls in metrics
    null_idx = rng.choice(len(pdf), size=20, replace=False)
    pdf.loc[null_idx[:10], "throughput_mbps"] = np.nan
    pdf.loc[null_idx[10:], "drop_rate"] = np.nan
    # a constant-latency hour-of-day → stddev 0 → 1e-9 guard fires
    pdf.loc[pdf["timestamp"].dt.hour == 3, "latency_ms"] = 42.0
    # dirty rows for the cleansing filter (dropped on ingest, kept for panels)
    pdf.loc[list(null_idx[:3]), "latency_ms"] = -1.0
    # out-of-range geo for the contract check
    pdf.loc[list(null_idx[3:5]), "lat"] = 123.0
    return pdf
