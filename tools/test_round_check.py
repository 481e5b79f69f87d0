#!/usr/bin/env python3
"""Self-test for tools/round_check.py and tools/coverage_check.py —
the truncated-wrapper fallback and the coverage drift gate. Pure
stdlib, no Spark: run `python3 tools/test_round_check.py` (round-close
checklist) — exits 0 on success, raises on the first failure."""
import json
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(script, *args):
    return subprocess.run([sys.executable, os.path.join(TOOLS, script),
                           *args], capture_output=True, text=True)


FULL_LINE = {"floors": {}, "spread": {"q01": 0.0, "q02": 0.0},
             "queries": {"q01": 1.5, "q02": 2.0}, "failed": [],
             "sf": "/root/testdata/sf0.1", "trials": 3, "noise": 0.1,
             "noise_max": 0.3, "sinks": {}, "sha": "a" * 40,
             "metric": "total", "value": 3.5, "unit": "sec"}


def wrapper(tail):
    return {"n": 99, "rc": 0, "cpus": 32, "sf": 0.1, "tail": tail}


def test_truncated_wrapper_recovers_from_stamped_copy():
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/bench")
        with open(f"{d}/bench/bench_sf0.1_001.json", "w") as f:
            json.dump(FULL_LINE, f)
        # tail lost its front: starts mid-queries, q01 gone
        tail = ('"q02":2.0},"failed":[],"sf":"/root/testdata/sf0.1",'
                '"trials":3,"noise":0.1,"noise_max":0.3,"sinks":{},'
                '"sha":"' + "a" * 40 + '","metric":"total","value":3.5,"unit":"sec"}')
        with open(f"{d}/BENCH_r99.json", "w") as f:
            json.dump(wrapper(tail), f)
        # prev knows q01 and q02; without the fallback q01 reads as
        # missing and the check FAILs — with it, the stamped copy's full
        # query map certifies
        with open(f"{d}/prev.json", "w") as f:
            json.dump(FULL_LINE, f)
        r = run("round_check.py", f"{d}/BENCH_r99.json", f"{d}/prev.json")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "front-truncated" in r.stdout and "bench_sf0.1_001.json" in r.stdout, r.stdout
        assert "ROUND CHECK PASS" in r.stdout


def test_truncated_wrapper_without_stamped_copy_refuses():
    with tempfile.TemporaryDirectory() as d:
        tail = ('"q02":2.0},"failed":[],"sf":"/root/testdata/sf0.1",'
                '"metric":"total","value":3.5,"unit":"sec"}')
        with open(f"{d}/BENCH_r99.json", "w") as f:
            json.dump(wrapper(tail), f)
        r = run("round_check.py", f"{d}/BENCH_r99.json")
        assert r.returncode == 1, r.stdout + r.stderr
        assert "front-truncated" in r.stdout, r.stdout
        assert "bench_sf0.1_NNN.json" in r.stdout, r.stdout
        assert "ROUND CHECK FAIL" in r.stdout


def test_value_mismatched_stamp_is_not_borrowed():
    # a stamped copy from a DIFFERENT run (other value) must not stand
    # in for the truncated wrapper
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/bench")
        other = dict(FULL_LINE, value=99.9)
        with open(f"{d}/bench/bench_sf0.1_001.json", "w") as f:
            json.dump(other, f)
        tail = '"q02":2.0},"failed":[],"metric":"total","value":3.5,"unit":"sec"}'
        with open(f"{d}/BENCH_r99.json", "w") as f:
            json.dump(wrapper(tail), f)
        r = run("round_check.py", f"{d}/BENCH_r99.json")
        assert r.returncode == 1 and "front-truncated" in r.stdout, r.stdout


def test_intact_wrapper_still_parses_by_regex():
    with tempfile.TemporaryDirectory() as d:
        tail = json.dumps(FULL_LINE)
        with open(f"{d}/BENCH_r99.json", "w") as f:
            json.dump(wrapper(tail), f)
        r = run("round_check.py", f"{d}/BENCH_r99.json")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "front-truncated" not in r.stdout
        assert "ROUND CHECK PASS" in r.stdout


def test_floor_adjusted_flags_hidden_data_cost_regression():
    # raw times 3.2s -> 4.7s (1.47x) would read as a soft warn at most —
    # but both sides carry a 2.7s floor, so the DATA cost went
    # 0.5s -> 2.0s (4x): a real plan regression the floor was hiding.
    # The floor-adjusted rule must HARD-fail it.
    with tempfile.TemporaryDirectory() as d:
        prev = dict(FULL_LINE, queries={"q01": 3.2}, value=3.2,
                    floors={"q01": 2.7}, spread={"q01": 0.1})
        fresh = dict(FULL_LINE, queries={"q01": 4.7}, value=4.7,
                     floors={"q01": 2.7}, spread={"q01": 0.1})
        with open(f"{d}/prev.json", "w") as f:
            json.dump(prev, f)
        with open(f"{d}/fresh.json", "w") as f:
            json.dump(fresh, f)
        r = run("round_check.py", f"{d}/fresh.json", f"{d}/prev.json")
        assert r.returncode == 1, r.stdout + r.stderr
        assert "floor-adjusted grading on 1 queries" in r.stdout, r.stdout
        assert "FAIL: q01" in r.stdout and "data 0.50s -> 2.00s" in r.stdout, r.stdout


def test_floor_move_alone_is_not_a_regression():
    # raw times 1.2s -> 4.3s (3.6x) would HARD-fail the raw rule — but
    # the floor moved with it (0.5s -> 3.6s: a deliberate harness-cost
    # change, e.g. more state stores) and the data cost is unchanged
    # (0.7s -> 0.7s). The floor-adjusted rule must pass the round.
    with tempfile.TemporaryDirectory() as d:
        prev = dict(FULL_LINE, queries={"q01": 1.2}, value=1.2,
                    floors={"q01": 0.5}, spread={"q01": 0.1})
        fresh = dict(FULL_LINE, queries={"q01": 4.3}, value=4.3,
                     floors={"q01": 3.6}, spread={"q01": 0.1})
        with open(f"{d}/prev.json", "w") as f:
            json.dump(prev, f)
        with open(f"{d}/fresh.json", "w") as f:
            json.dump(fresh, f)
        r = run("round_check.py", f"{d}/fresh.json", f"{d}/prev.json")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "ROUND CHECK PASS" in r.stdout, r.stdout


def test_floor_drop_with_raw_improvement_is_exonerated():
    # r17's q151: the source digest changed, floors were re-measured and
    # q151's floor DROPPED 2.18s -> 1.17s, flipping its data cost
    # 0.00s -> 0.75s — while the raw median IMPROVED 2.09s -> 1.92s.
    # A query whose raw time did not regress cannot be a regression;
    # the floor side moved, not the query. Must exonerate, not warn.
    with tempfile.TemporaryDirectory() as d:
        prev = dict(FULL_LINE, queries={"q151": 2.09}, value=2.09,
                    floors={"q151": 2.18}, spread={"q151": 0.1})
        fresh = dict(FULL_LINE, queries={"q151": 1.92}, value=1.92,
                     floors={"q151": 1.17}, spread={"q151": 0.1})
        with open(f"{d}/prev.json", "w") as f:
            json.dump(prev, f)
        with open(f"{d}/fresh.json", "w") as f:
            json.dump(fresh, f)
        r = run("round_check.py", f"{d}/fresh.json", f"{d}/prev.json")
        assert r.returncode == 0, r.stdout + r.stderr
        assert "warn: q151" not in r.stdout, r.stdout
        assert "exonerated: q151" in r.stdout, r.stdout
        assert "raw did not regress" in r.stdout, r.stdout


def test_floor_drop_with_raw_regression_still_warns():
    # same floor drop, but the raw median REGRESSED beyond spread: the
    # data-cost signal is real and must still surface.
    with tempfile.TemporaryDirectory() as d:
        prev = dict(FULL_LINE, queries={"q151": 2.09}, value=2.09,
                    floors={"q151": 2.18}, spread={"q151": 0.1})
        fresh = dict(FULL_LINE, queries={"q151": 3.40}, value=3.40,
                     floors={"q151": 1.17}, spread={"q151": 0.1})
        with open(f"{d}/prev.json", "w") as f:
            json.dump(prev, f)
        with open(f"{d}/fresh.json", "w") as f:
            json.dump(fresh, f)
        r = run("round_check.py", f"{d}/fresh.json", f"{d}/prev.json")
        assert "q151" in r.stdout and "exonerated: q151" not in r.stdout, r.stdout
        assert ("warn: q151" in r.stdout) or ("FAIL: q151" in r.stdout), r.stdout


def synth_repo(d, carrier_cell, correctness):
    os.makedirs(f"{d}/src/main/scala/graft", exist_ok=True)
    with open(f"{d}/src/main/scala/graft/SparkEntry.scala", "w") as f:
        f.write('x Map("q01_agg" -> a, "q02_join" -> b)\n')
    with open(f"{d}/COVERAGE.md", "w") as f:
        f.write("| ID | Operator | Implementation | Query | Test |\n"
                "|---|---|---|---|---|\n"
                f"| S1 | op | file.scala | {carrier_cell} | Spec |\n")
    with open(f"{d}/CORRECTNESS_r01.json", "w") as f:
        json.dump(correctness, f)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}


def test_coverage_check_passes_on_green_carrier():
    with tempfile.TemporaryDirectory() as d:
        synth_repo(d, "q01 (carrier)", {"q01_agg": GREEN, "q02_join": GREEN})
        r = run("coverage_check.py", d)
        assert r.returncode == 0, r.stdout + r.stderr


def test_coverage_check_fails_on_nonexistent_carrier():
    with tempfile.TemporaryDirectory() as d:
        synth_repo(d, "q99 (nonexistent)", {"q01_agg": GREEN})
        r = run("coverage_check.py", d)
        assert r.returncode == 1, r.stdout + r.stderr
        assert "q99 not in SparkEntry.queries" in r.stdout, r.stdout


def test_coverage_check_fails_on_red_carrier():
    with tempfile.TemporaryDirectory() as d:
        red = dict(GREEN, hash_match=False)
        synth_repo(d, "q02", {"q01_agg": GREEN, "q02_join": red})
        r = run("coverage_check.py", d)
        assert r.returncode == 1, r.stdout + r.stderr
        assert "not green" in r.stdout, r.stdout


def test_round_check_surfaces_coverage_failure():
    with tempfile.TemporaryDirectory() as d:
        synth_repo(d, "q99 (nonexistent)", {"q01_agg": GREEN})
        with open(f"{d}/fresh.json", "w") as f:
            json.dump(FULL_LINE, f)
        r = run("round_check.py", f"{d}/fresh.json")
        assert r.returncode == 1, r.stdout + r.stderr
        assert "coverage_check FAIL" in r.stdout, r.stdout


if __name__ == "__main__":
    fns = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for fn in fns:
        fn()
        print(f"ok: {fn.__name__}")
    print(f"{len(fns)}/{len(fns)} round_check/coverage_check self-tests pass")
