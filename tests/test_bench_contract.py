"""The bench harness's one-line-JSON stdout contract.

The driver captures ``bench.py``'s stdout+stderr MERGED and parses the
LAST line as JSON. Round 9's capture became unparseable because the
wrapper relayed an uncleared-retry stderr line ("RETRY CONFIRMED")
*after* the child's JSON had already flowed through — which silenced a
full round of automated round-over-round comparison (``BENCH_r09.json``
``parsed: null``). The wrapper now buffers child stdout and emits it
only after child stderr reaches EOF, so the JSON is the final line of
any merged capture by construction. These tests drive the REAL
``_filtered_reexec`` against a stub child that reproduces the r9
failure ordering (stderr written after the stdout JSON, post-flush).

No Spark session needed — pure subprocess plumbing.
"""

import json
import subprocess
import sys
import textwrap

REPO = __file__.rsplit("/tests/", 1)[0]

# Parent driver: imports the real bench module, points its __file__ at
# the stub child (the one seam _filtered_reexec has), and runs the real
# wrapper. SystemExit carries the child's rc.
PARENT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import bench
    bench.__dict__["__file__"] = {stub!r}
    try:
        bench._filtered_reexec()
    except SystemExit as e:
        raise SystemExit(e.code)
""")

# Stub child: the r9 failure shape — JSON to stdout, FLUSHED, then a
# late uncleared-retry line on stderr (plus the noise classes the
# wrapper filters: a Stage progress frame and a BrokenPipeError block).
STUB = textwrap.dedent("""
    import os, sys, time
    assert os.environ.get("BENCH_WRAPPED") == "1"
    print("[Stage 3:=====>    (1 + 1) / 2]", file=sys.stderr)
    print('{"metric": "headline_queries_total_wall_clock", "value": 1.0,'
          ' "unit": "sec", "queries": {"q": 1.0}, "sf": 0.001}')
    sys.stdout.flush()
    time.sleep(0.3)
    print("RETRY CONFIRMED: q retried at 9.99s, still above limit",
          file=sys.stderr)
""")


def _run_wrapper(tmp_path):
    stub = tmp_path / "stub_bench.py"
    stub.write_text(STUB)
    parent = tmp_path / "parent.py"
    parent.write_text(PARENT.format(repo=REPO, stub=str(stub)))
    return subprocess.run(
        [sys.executable, str(parent)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=60)


def test_merged_capture_ends_with_json(tmp_path):
    r = _run_wrapper(tmp_path)
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert lines, "wrapper produced no output"
    # the uncleared-retry line must be PRESENT (real errors/flags still
    # reach the operator) but strictly BEFORE the final JSON line
    assert any("RETRY CONFIRMED" in l for l in lines[:-1])
    doc = json.loads(lines[-1])
    assert doc["metric"] == "headline_queries_total_wall_clock"
    assert doc["queries"] == {"q": 1.0}


def test_stage_frames_filtered(tmp_path):
    r = _run_wrapper(tmp_path)
    assert "[Stage 3:" not in r.stdout
