"""HTML/SVG report generation."""

import numpy as np

from stutter_tpu import report


def test_roc_svg_and_html(tmp_path):
    curves = [
        {"label": "m-a", "fpr": np.linspace(0, 1, 10), "tpr": np.sqrt(np.linspace(0, 1, 10)), "auc": 0.75}
    ]
    svg = report.roc_svg(curves)
    assert "<svg" in svg and "polyline" in svg and "AUC 0.75" in svg
    report.write_html(tmp_path / "r.html", "ROC", [svg])
    text = (tmp_path / "r.html").read_text()
    assert text.startswith("<!doctype html>") and "<svg" in text


def test_confusion_and_bar_svg():
    cm = np.array([[10, 2], [1, 9]])
    svg = report.confusion_svg(cm, ["a", "b"], "CM")
    assert svg.count("<rect") == 4 and ">10<" in svg
    bar = report.bar_svg(["x", "y"], [50.0, 75.0], "acc")
    assert bar.count("<rect") == 2 and "75.0%" in bar


def test_escaping():
    svg = report.bar_svg(["<evil>"], [1.0], "t<i>tle")
    assert "<evil>" not in svg and "&lt;evil&gt;" in svg
