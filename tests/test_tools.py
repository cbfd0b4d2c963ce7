"""Unit tests for tools/bench_compare.py (pure python, no Spark).

Pins the two ADVICE r13 seams: load() must accept shell-captured check
files (leading whitespace before the first JSON document, a second
compact document after it), and a run with NO spread key at all must be
labeled MIXED — all() over an empty dict is vacuously True, which
previously let a legacy check file masquerade as a warm-median
comparison while silently falling back to cold-contaminated all-reps
medians.
"""

import json
import sys

sys.path.insert(0, "/root/repo/tools")

import bench_compare  # noqa: E402


def _check(queries, spread=None, total=10.0):
    run = {"metric": "suite_seconds", "value": total, "unit": "sec",
           "queries": queries}
    if spread is not None:
        run["spread"] = spread
    return run


def test_load_accepts_leading_whitespace_and_trailing_document(tmp_path):
    p = tmp_path / "check.json"
    run = _check({"q1": 1.0})
    p.write_text("\n  " + json.dumps(run) + "\n" + json.dumps({"compact": 1}))
    assert bench_compare.load(str(p)) == run


def test_missing_spread_is_labeled_mixed_not_warm(tmp_path, capsys, monkeypatch):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    # legacy old run: no spread key at all (the vacuous-True case)
    old.write_text(json.dumps(_check({"q1": 1.0, "q2": 2.0})))
    new.write_text(json.dumps(_check(
        {"q1": 1.1, "q2": 2.1},
        spread={"q1": {"warm": {"median": 1.1}}, "q2": {"warm": {"median": 2.1}}},
    )))
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", str(old), str(new)])
    bench_compare.main()
    out = capsys.readouterr().out
    assert "MIXED" in out, out

    # and an empty spread dict is equally not-warm
    old.write_text(json.dumps(_check({"q1": 1.0, "q2": 2.0}, spread={})))
    bench_compare.main()
    assert "MIXED" in capsys.readouterr().out


def test_warm_to_warm_comparison_keeps_warm_label(tmp_path, capsys, monkeypatch):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    spread_old = {"q1": {"warm": {"median": 1.0}}, "q2": {"warm": {"median": 2.0}}}
    spread_new = {"q1": {"warm": {"median": 1.5}}, "q2": {"warm": {"median": 2.0}}}
    old.write_text(json.dumps(_check({"q1": 1.2, "q2": 2.2}, spread=spread_old)))
    new.write_text(json.dumps(_check({"q1": 1.6, "q2": 2.1}, spread=spread_new)))
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", str(old), str(new)])
    bench_compare.main()
    out = capsys.readouterr().out
    assert "MIXED" not in out, out
    # the q1 1.5x warm move must be attributed as a mover
    warm_line = [l for l in out.splitlines() if l.startswith("[warm median]")][0]
    assert "q1" in warm_line and "none" not in warm_line, out
