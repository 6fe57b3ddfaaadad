"""bench.py detail-file guard (r10 verdict task #2).

Twice (r9, r10) a verification ``bench.py`` run overwrote the driver's
uncommitted ``BENCH_DETAIL.json`` in place, losing the round's per-query
record.  ``bench._detail_target`` ends that class in code: an existing
detail file whose content is not recoverable from git HEAD (modified or
untracked) diverts the write to ``BENCH_DETAIL.unsaved.json`` unless the
caller opts out via ``--label`` / ``--force-detail``.  These tests drive
the resolver against a throwaway git repo — no Spark needed.
"""

from __future__ import annotations

import os
import subprocess

import pytest

import bench


GIT_ENV = {
    **os.environ,
    "GIT_AUTHOR_NAME": "t",
    "GIT_AUTHOR_EMAIL": "t@t",
    "GIT_COMMITTER_NAME": "t",
    "GIT_COMMITTER_EMAIL": "t@t",
}


def _git(repo, *args):
    subprocess.run(
        ["git", "-C", str(repo), *args],
        check=True, capture_output=True, env=GIT_ENV,
    )


@pytest.fixture()
def repo(tmp_path):
    _git(tmp_path, "init", "-q")
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text('{"committed": true}')
    _git(tmp_path, "add", "BENCH_DETAIL.json")
    _git(tmp_path, "commit", "-qm", "detail")
    return tmp_path


def _target(repo, argv=()):
    return bench._detail_target(str(repo / "BENCH_DETAIL.json"), list(argv))


def test_clean_tracked_file_is_overwritten_in_place(repo):
    path, warning = _target(repo)
    assert path == str(repo / "BENCH_DETAIL.json")
    assert warning is None


def test_missing_file_is_written_in_place(repo):
    (repo / "BENCH_DETAIL.json").unlink()
    path, warning = _target(repo)
    assert path == str(repo / "BENCH_DETAIL.json")
    assert warning is None


def test_modified_tracked_file_diverts(repo):
    (repo / "BENCH_DETAIL.json").write_text('{"driver": "uncommitted"}')
    path, warning = _target(repo)
    assert path == str(repo / "BENCH_DETAIL.unsaved.json")
    assert warning and "not recoverable" in warning
    # the driver's content survives untouched
    assert (repo / "BENCH_DETAIL.json").read_text() == '{"driver": "uncommitted"}'


def test_untracked_file_diverts(tmp_path):
    _git(tmp_path, "init", "-q")
    (tmp_path / "BENCH_DETAIL.json").write_text("{}")
    path, warning = bench._detail_target(
        str(tmp_path / "BENCH_DETAIL.json"), []
    )
    assert path == str(tmp_path / "BENCH_DETAIL.unsaved.json")
    assert warning is not None


def test_force_detail_overrides_the_guard(repo):
    (repo / "BENCH_DETAIL.json").write_text("dirty")
    path, warning = _target(repo, ["--force-detail"])
    assert path == str(repo / "BENCH_DETAIL.json")
    assert warning is None


def test_label_writes_sibling_and_never_touches_default(repo):
    (repo / "BENCH_DETAIL.json").write_text("dirty")
    path, warning = _target(repo, ["--label", "r11-quiet"])
    assert path == str(repo / "BENCH_DETAIL.r11-quiet.json")
    assert warning is None


def test_bad_label_rejected(repo):
    with pytest.raises(SystemExit):
        _target(repo, ["--label", "../escape"])


def test_outside_git_repo_keeps_old_behavior(tmp_path):
    # no `git init`: the guard cannot judge recoverability -> in place
    (tmp_path / "BENCH_DETAIL.json").write_text("{}")
    path, warning = bench._detail_target(
        str(tmp_path / "BENCH_DETAIL.json"), []
    )
    assert path == str(tmp_path / "BENCH_DETAIL.json")
    assert warning is None


def test_label_without_value_rejected(repo):
    with pytest.raises(SystemExit):
        _target(repo, ["--label"])


def test_label_followed_by_flag_rejected(repo):
    # "--label --force-detail" must not eat the flag as the label value
    # (dashes are stripped before the isalnum check, so without an explicit
    # leading-dash rejection this would write BENCH_DETAIL.--force-detail.json
    # and silently drop the force behavior).
    with pytest.raises(SystemExit):
        _target(repo, ["--label", "--force-detail"])


def test_consecutive_diverts_do_not_overwrite_each_other(repo):
    # Two guarded runs in a row: the second divert must pick a fresh name
    # instead of clobbering the first diverted record (the loss class the
    # guard exists to end, one hop removed).
    (repo / "BENCH_DETAIL.json").write_text('{"driver": "uncommitted"}')
    first, _ = _target(repo)
    assert first == str(repo / "BENCH_DETAIL.unsaved.json")
    (repo / "BENCH_DETAIL.unsaved.json").write_text('{"run": 1}')
    second, warning = _target(repo)
    assert second == str(repo / "BENCH_DETAIL.unsaved-2.json")
    assert warning is not None
    (repo / "BENCH_DETAIL.unsaved-2.json").write_text('{"run": 2}')
    third, _ = _target(repo)
    assert third == str(repo / "BENCH_DETAIL.unsaved-3.json")
    assert (repo / "BENCH_DETAIL.unsaved.json").read_text() == '{"run": 1}'


# --- derived window_quality verdict (r12 verdict task #6) -----------------


def test_window_quality_matches_judged_history():
    """bench._window_quality must reproduce the judge's window calls on
    the committed calibration artifacts: the r10/r12 quiet details are
    ``ok``, the r12 driver bench and the r11 detail are ``degraded-end``
    (par canary 2.4-2.5x its same-block single spin)."""
    import json
    import os

    from bench import _window_quality

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def verdict(rel: str) -> str:
        d = json.load(open(os.path.join(root, rel)))
        return _window_quality(d["calibration"], int(d.get("cpus") or 32))

    assert verdict("tools/bench_r10_quiet.json") == "ok"
    assert verdict("BENCH_DETAIL.r12-quiet.json") == "ok"
    # the r12 driver window self-flagged: par end 256.2 ms vs jvm single
    # 107.1 -> 2.39x.  Pinned under a round-stable name: the bare
    # BENCH_DETAIL.json is overwritten by every driver close (the r13
    # driver run clobbered the r12 content this assertion used to read),
    # so tests must only ever reference promoted per-round copies.
    assert verdict("BENCH_DETAIL.r12-driver.json") == "degraded-end"
    assert verdict("BENCH_DETAIL.r11-quiet.json") == "degraded-end"


def test_window_quality_blocks_and_fallbacks():
    """Classifier unit pins: settled start keys preferred over raw start,
    cpus scaling of the parallel ideal, py-only fallback when par keys
    are absent, and the four verdict values."""
    from bench import _window_quality

    quiet = {
        "py_spin_ms_start": 100.0, "py_spin_ms_end": 100.0,
        "jvm_spin_ms_start": 300.0,          # raw start: C2 churn...
        "jvm_spin_par_ms_start": 900.0,      # ...3x — would read degraded
        "jvm_spin_ms_start_settled": 100.0,  # settled: at floor
        "jvm_spin_par_ms_start_settled": 150.0,
        "jvm_spin_ms_end": 100.0, "jvm_spin_par_ms_end": 150.0,
    }
    assert _window_quality(quiet, 32) == "ok"
    # without the settled keys the same raw start reads degraded-start
    raw = {k: v for k, v in quiet.items() if "settled" not in k}
    assert _window_quality(raw, 32) == "degraded-start"
    # a co-tenant eating cores at the end: par 2.5x single
    end_bad = dict(quiet, jvm_spin_par_ms_end=250.0)
    assert _window_quality(end_bad, 32) == "degraded-end"
    assert _window_quality(dict(raw, jvm_spin_par_ms_end=250.0), 32) == (
        "degraded"
    )
    # on 8 cpus the 32-task ideal is 4x the single spin, not 1x
    assert _window_quality(dict(quiet, jvm_spin_par_ms_end=500.0), 8) == "ok"
    assert _window_quality(dict(quiet, jvm_spin_par_ms_end=900.0), 8) == (
        "degraded-end"
    )
    # pre-r11 artifact (no par keys): py canary alone decides
    legacy = {"py_spin_ms_start": 100.0, "py_spin_ms_end": 200.0,
              "jvm_spin_ms_start": 100.0, "jvm_spin_ms_end": 100.0}
    assert _window_quality(legacy, 32) == "degraded-end"
    assert _window_quality(dict(legacy, py_spin_ms_end=100.0), 32) == "ok"


def test_window_quality_mid_block():
    """r14: a burst confined to the MIDDLE of the suite (both endpoint
    blocks at their floors — the 2026-08-18 262 s / 363 s failure mode)
    must flag ``degraded-mid``; endpoint verdicts keep precedence, and
    artifacts without mid keys are classified exactly as before."""
    from bench import _window_quality

    quiet = {
        "py_spin_ms_start": 100.0, "py_spin_ms_end": 100.0,
        "jvm_spin_ms_start_settled": 100.0,
        "jvm_spin_par_ms_start_settled": 150.0,
        "jvm_spin_ms_end": 100.0, "jvm_spin_par_ms_end": 150.0,
    }
    assert _window_quality(quiet, 32) == "ok"  # no mid keys: unchanged
    mid_ok = dict(quiet, py_spin_ms_mid=100.0, jvm_spin_ms_mid=100.0,
                  jvm_spin_par_ms_mid=150.0)
    assert _window_quality(mid_ok, 32) == "ok"
    mid_bad = dict(quiet, py_spin_ms_mid=100.0, jvm_spin_ms_mid=100.0,
                   jvm_spin_par_ms_mid=450.0)   # 4.5x single: burst
    assert _window_quality(mid_bad, 32) == "degraded-mid"
    # endpoint degradation outranks the mid flag (same verdicts as r13)
    assert _window_quality(
        dict(mid_bad, jvm_spin_par_ms_end=250.0), 32
    ) == "degraded-end"
