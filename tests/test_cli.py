"""CLI parity tests (reference: /root/reference/cli/bloom.go:57-113 —
new/set/get/reset/stats against a persisted filter file)."""

import json
import subprocess
import sys


def run(*args):
    return subprocess.run(
        [sys.executable, "-m", "sprout_spark", *args],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    ).stdout


def test_cli_lifecycle(tmp_path):
    path = str(tmp_path / "f.bloom")
    run("new", "-path", path, "-capacity", "1000", "-err", "0.01")
    run("set", "-path", path, "alpha", "beta")
    out = run("get", "-path", path, "alpha", "beta", "gamma")
    lines = dict(l.split("\t") for l in out.strip().splitlines())
    assert lines["alpha"] == "true" and lines["beta"] == "true"
    assert lines["gamma"] == "false"
    stats = json.loads(run("stats", "-path", path))
    assert stats["count"] == 2 and stats["capacity"] == 1000
    run("reset", "-path", path)
    assert json.loads(run("stats", "-path", path))["count"] == 0


def test_cli_scalable(tmp_path):
    path = str(tmp_path / "s.bloom")
    run("new", "-path", path, "-scalable", "-capacity", "100")
    keys = [f"k{i}" for i in range(500)]
    run("set", "-path", path, *keys)
    stats = json.loads(run("stats", "-path", path))
    assert stats["count"] == 500 and stats["stages"] > 1
    out = run("get", "-path", path, "k0", "k499", "nope")
    lines = dict(l.split("\t") for l in out.strip().splitlines())
    assert lines["k0"] == "true" and lines["k499"] == "true"


def test_cli_int_keys(tmp_path):
    path = str(tmp_path / "i.bloom")
    run("new", "-path", path, "-capacity", "1000")
    run("set", "-path", path, "-int", "7", "42")
    out = run("get", "-path", path, "-int", "7", "42", "99")
    lines = dict(l.split("\t") for l in out.strip().splitlines())
    assert lines["7"] == "true" and lines["42"] == "true" and lines["99"] == "false"
    # string probe of an int-built filter is a different key space
    out2 = run("get", "-path", path, "7")
    assert dict(l.split("\t") for l in out2.strip().splitlines())["7"] == "false"
