"""check_run_dir overwrite guard (ref tasks/pmf/option.py:70-81)."""
import os

import pytest

from pmf_tpu.config import check_run_dir

pytestmark = pytest.mark.smoke


def _mkrun(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    (d / "log.txt").write_text("old")
    return str(d)


def test_missing_dir_is_noop(tmp_path):
    check_run_dir(str(tmp_path / "nope"), "abort")  # no raise


def test_reuse_keeps_contents(tmp_path):
    d = _mkrun(tmp_path)
    check_run_dir(d, "reuse")
    assert os.path.isfile(os.path.join(d, "log.txt"))


def test_delete_removes_dir(tmp_path):
    d = _mkrun(tmp_path)
    check_run_dir(d, "delete")
    assert not os.path.exists(d)


def test_abort_raises(tmp_path):
    d = _mkrun(tmp_path)
    with pytest.raises(OSError):
        check_run_dir(d, "abort")
    assert os.path.isdir(d)


def test_ask_delete_and_quit(tmp_path, monkeypatch):
    d = _mkrun(tmp_path)
    monkeypatch.setattr("builtins.input", lambda *_: "d")
    check_run_dir(d, "ask")
    assert not os.path.exists(d)

    d = _mkrun(tmp_path)
    monkeypatch.setattr("builtins.input", lambda *_: "q")
    with pytest.raises(OSError):
        check_run_dir(d, "ask")


def test_auto_without_tty_reuses(tmp_path, monkeypatch, capsys):
    d = _mkrun(tmp_path)
    monkeypatch.setattr("sys.stdin.isatty", lambda: False, raising=False)
    check_run_dir(d, "auto")  # warns, keeps dir, never prompts
    assert os.path.isdir(d)
    assert "reusing existing run dir" in capsys.readouterr().err
