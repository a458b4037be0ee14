"""Unit coverage for tools/score_exteval.py's pooled->per-register split.

The EXTEVAL artifact's per_register breakdown is derived from the POOLED
two-register report by variant-order position (each word's margin rows
arrive as [male x V, female x V], the order make_hnm_corpus.py writes and
keyword_id_report preserves).  An off-by-one here would silently swap the
registers' accuracies, so the mapping is pinned on a synthetic report
where the two registers have distinct, known outcomes.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "score_exteval", REPO / "tools" / "score_exteval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_split_registers_mapping():
    mod = _load()
    # Two words x (2 male + 2 female) rows.  Male rows all correct with
    # fat margins; female rows: one error per word, thin margins.
    margins = []
    for word in ("back", "down"):
        margins += [
            {"word": word, "predicted": word, "margin": 0.5},
            {"word": word, "predicted": word, "margin": 0.3},
            {"word": word, "predicted": word, "margin": 0.05},
            {"word": word, "predicted": "up", "margin": -0.02},
        ]
    out = mod.split_registers({"margins": margins}, variants=2)
    assert out["male"] == {"n": 4, "accuracy": 1.0,
                           "margin_min": 0.3, "margin_median": 0.4}
    assert out["female"]["n"] == 4
    assert out["female"]["accuracy"] == 0.5
    assert out["female"]["margin_min"] == -0.02


def test_split_registers_skips_nonfinite_margins():
    mod = _load()
    # Unknown-word rows carry no margin key (advisor r4): the split must
    # aggregate without them, same as the pooled summary does.
    margins = [
        {"word": "back", "predicted": "back", "margin": 0.4},
        {"word": "back", "predicted": "back"},  # no margin key
        {"word": "back", "predicted": "back", "margin": 0.2},
        {"word": "back", "predicted": "back", "margin": 0.1},
    ]
    out = mod.split_registers({"margins": margins}, variants=2)
    assert out["male"]["margin_min"] == 0.4
    assert out["female"]["margin_median"] == 0.15
