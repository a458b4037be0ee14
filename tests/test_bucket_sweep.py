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


def test_recommend_prewarm_covers_distribution():
    from bucket_sweep import recommend_prewarm

    lengths = np.array([120, 130, 140, 260, 270, 430] * 10 + [900])
    prewarm = recommend_prewarm(lengths, 50, coverage=0.98)
    assert prewarm == sorted(prewarm)
    assert all(b % 50 == 0 for b in prewarm)
    padded = -(-lengths // 50) * 50
    covered = np.isin(padded, prewarm).mean()
    assert covered >= 0.98
    # The rare 900-frame outlier may stay cold.
    assert 150 in prewarm and 300 in prewarm and 450 in prewarm


def test_ini_bucket_options(tmp_path):
    """decode_online threads segment_length_multiple / prewarm_frames from
    the INI into the word-path units."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    import decode_online

    src = os.path.join(os.path.dirname(__file__), "..", "config",
                       "debug_settings.ini")
    cfg = tmp_path / "cfg.ini"
    text = open(src).read().replace(
        "segment_length_multiple = 50", "segment_length_multiple = 25"
    ).replace(
        "segment_prewarm_frames = [50, 150, 200, 250, 300]",
        "segment_prewarm_frames = [75, 125]",
    )
    cfg.write_text(text)
    settings = decode_online.build_neuroprostetics_settings(
        str(cfg), "run", overwrite=True)
    assert settings.segment_length_multiple == 25
    assert settings.segment_prewarm_frames == (75, 125)


def test_auto_bucket_policy_from_labs(tmp_path):
    """segment_policy_labs derives both bucket settings from observed
    log.vad.lab distributions and overrides the explicit keys."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    import decode_online

    labs = tmp_path / "runs"
    labs.mkdir()
    rows = "".join(f"0.0\t1.0\t{n} frames\n"
                   for n in [120, 130, 140, 260, 270, 430] * 3)
    (labs / "log.vad.lab").write_text(rows)

    src = os.path.join(os.path.dirname(__file__), "..", "config",
                       "debug_settings.ini")
    cfg = tmp_path / "cfg.ini"
    cfg.write_text(open(src).read().replace(
        "[Decoding]",
        "[Decoding]\nsegment_policy_labs = " + str(labs / "*.lab")))
    settings = decode_online.build_neuroprostetics_settings(
        str(cfg), "run", overwrite=True)

    from dss_tpu.runtime.bucket_policy import choose_policy, load_lab_lengths

    lengths = load_lab_lengths([str(labs / "log.vad.lab")])
    want_mult, want_prewarm = choose_policy(lengths)
    assert settings.segment_length_multiple == want_mult
    assert settings.segment_prewarm_frames == want_prewarm
    # Every observed bucket is in the prewarm list (full coverage here).
    padded = -(-lengths // want_mult) * want_mult
    assert set(padded.tolist()) <= set(want_prewarm)


def test_auto_bucket_policy_too_few_segments(tmp_path):
    """Fewer than 5 observed segments keeps the configured buckets."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    import decode_online

    labs = tmp_path / "runs"
    labs.mkdir()
    (labs / "log.vad.lab").write_text("0.0\t1.0\t120 frames\n")

    src = os.path.join(os.path.dirname(__file__), "..", "config",
                       "debug_settings.ini")
    cfg = tmp_path / "cfg.ini"
    cfg.write_text(open(src).read().replace(
        "[Decoding]",
        "[Decoding]\nsegment_policy_labs = " + str(labs / "*.lab")))
    settings = decode_online.build_neuroprostetics_settings(
        str(cfg), "run", overwrite=True)
    assert settings.segment_length_multiple == 50
    assert settings.segment_prewarm_frames == (50, 150, 200, 250, 300)
