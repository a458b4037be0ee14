"""Bucket-sweep tool: .lab parsing and the cost-model trade-off."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from bucket_sweep import load_lab_lengths, sweep, synthetic_lengths


def test_load_lab_lengths(tmp_path):
    lab = tmp_path / "log.vad.lab"
    lab.write_text("1.54\t4.57\t303 frames\n7.00\t7.80\t80 frames\n")
    lengths = load_lab_lengths([str(lab)])
    assert lengths.tolist() == [303, 80]


def test_sweep_tradeoff():
    """Bigger buckets -> fewer compiles but more padding; the cost model
    must reflect both monotonically."""
    lengths = synthetic_lengths(200, seed=3)
    rows = sweep(lengths, [10, 50, 150], compile_cost_s=30.0,
                 per_frame_s=150e-6)
    by_mult = {r["length_multiple"]: r for r in rows}
    assert by_mult[10]["buckets"] > by_mult[50]["buckets"] > \
        by_mult[150]["buckets"]
    assert by_mult[10]["padding_overhead"] < by_mult[50]["padding_overhead"] \
        < by_mult[150]["padding_overhead"]
    # All padded lengths are multiples of the bucket and >= the raw length.
    padded = -(-lengths // 50) * 50
    assert np.all(padded % 50 == 0) and np.all(padded >= lengths)
