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
