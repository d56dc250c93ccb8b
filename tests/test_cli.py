"""CLI integration (reference: /root/reference/tests/cli.rs)."""

import subprocess
import sys


def run_cli(args, stdin=""):
    return subprocess.run(
        [sys.executable, "-m", "heliport_spark", *args],
        input=stdin, capture_output=True, text=True, cwd="/root/repo",
    )


def test_identify_stdout_labels():
    p = run_cli(["identify"], stdin="Hola, ¿qué tal?\nhello world this is english\n")
    assert p.returncode == 0
    assert p.stdout.splitlines() == ["spa", "eng"]


def test_identify_scores_precision():
    p = run_cli(["identify", "-s"], stdin="Hola, ¿qué tal?\n")
    assert p.stdout.splitlines() == ["spa\t0.2340"]
    p2 = run_cli(["identify", "-s", "-p", "2"], stdin="Hola, ¿qué tal?\n")
    assert p2.stdout.splitlines() == ["spa\t0.23"]


def test_identify_ignore_confidence():
    p = run_cli(["identify", "-c"], stdin="hello\n")
    assert p.stdout.splitlines() == ["sah"]


def test_detect_alias():
    p = run_cli(["detect"], stdin="DOKUMENT INFORMACYJNY NR [...]\n")
    assert p.stdout.splitlines() == ["pol"]


def test_bad_subcommand():
    p = run_cli(["no-such-cmd"])
    assert p.returncode != 0
