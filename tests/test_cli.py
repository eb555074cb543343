"""Batch CLI parity with the reference binary (`scrapelect <file.scrp>
<url>` → pretty JSON on stdout, /root/reference/src/main.rs:44-62):
golden-corpus stdout byte-for-byte, the anyhow-style error report
shapes, and the subcommand/usage surface."""

import io
import json
import subprocess
import sys

import pytest

from scrapelect_spark.__main__ import main, run
from scrapelect_spark.functions.value import to_json_pretty

SCRPS = "/root/reference/examples/scrps"
INPUTS = "/root/reference/examples/inputs"
SNAPS = "/root/reference/examples/outputs"

# recurser needs network (links to a live https URL) — offline goldens:
GOLDENS = ["abc", "attr", "qualifiers", "relative", "filter_select"]


def golden_body(name: str) -> str:
    with open(f"{SNAPS}/{name}.snap") as f:
        return f.read().split("---", 2)[2].lstrip("\n")


@pytest.mark.parametrize("name", GOLDENS)
def test_run_golden_stdout_byte_exact(name):
    out, err = io.StringIO(), io.StringIO()
    rc = run(
        f"{SCRPS}/{name}.scrp", f"file://{INPUTS}/{name}.html", out=out, err=err
    )
    assert rc == 0 and err.getvalue() == ""
    expected = to_json_pretty(json.loads(golden_body(name))) + "\n"
    assert out.getvalue() == expected


def test_run_subprocess_end_to_end():
    """The real `python -m scrapelect_spark run` process, stdout pinned."""
    p = subprocess.run(
        [sys.executable, "-m", "scrapelect_spark", "run",
         f"{SCRPS}/abc.scrp", f"file://{INPUTS}/abc.html"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    assert p.stdout == to_json_pretty(json.loads(golden_body("abc"))) + "\n"


def test_default_mode_is_run():
    """main.rs flattens RunArgs: no subcommand == run (main.rs:14-28)."""
    p = subprocess.run(
        [sys.executable, "-m", "scrapelect_spark",
         f"{SCRPS}/abc.scrp", f"file://{INPUTS}/abc.html"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0
    assert p.stdout == to_json_pretty(json.loads(golden_body("abc"))) + "\n"


def test_missing_file_error_report():
    """anyhow report shape: context line, blank, 'Caused by:' + cause."""
    out, err = io.StringIO(), io.StringIO()
    rc = run("/nonexistent/x.scrp", "file:///dev/null", out=out, err=err)
    assert rc == 1 and out.getvalue() == ""
    lines = err.getvalue().splitlines()
    assert lines[0] == "Error: error reading file /nonexistent/x.scrp"
    assert lines[1] == "" and lines[2] == "Caused by:"
    assert lines[3].startswith("    ")


def test_parse_error_report(tmp_path):
    bad = tmp_path / "bad.scrp"
    bad.write_text("a: {{{{;")
    out, err = io.StringIO(), io.StringIO()
    rc = run(str(bad), "file:///dev/null", out=out, err=err)
    assert rc == 1 and out.getvalue() == ""
    assert err.getvalue().startswith(f"Error: parse error in {bad}:")
    assert "Caused by:" in err.getvalue()


def test_interpret_error_report(tmp_path):
    """A runtime (fetch) failure prints Error: <msg> with no context
    wrapper — interpret errors aren't file-context-wrapped in main.rs."""
    good = tmp_path / "ok.scrp"
    good.write_text('a: "x";')
    out, err = io.StringIO(), io.StringIO()
    rc = run(str(good), "file:///nonexistent/page.html", out=out, err=err)
    assert rc == 1
    assert err.getvalue().startswith("Error: reading from file ")


def test_usage_on_bad_args():
    assert main([]) == 2
    assert main(["run", "only-one-arg"]) == 2


def test_version_and_help_flags():
    """clap's auto flags parity (main.rs #[command(version)])."""
    p = subprocess.run(
        [sys.executable, "-m", "scrapelect_spark", "--version"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0 and p.stdout.startswith("scrapelect-spark ")
    assert "scrapelect v0.4.0" in p.stdout
    assert main(["--help"]) == 0
    assert main(["-V"]) == 0
