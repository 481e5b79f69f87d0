#!/usr/bin/env python3
"""SURVEY↔registry↔CORRECTNESS cross-check.

COVERAGE.md's 69-row operator table is hand-maintained, and every judge
re-derives it against the query registry and the correctness artifact.
This script makes coverage drift impossible to miss:

  1. every carrier query named in a COVERAGE.md table row must exist in
     SparkEntry.queries (parsed from the Scala source — the registry's
     source of truth), and
  2. every carrier must be GREEN (rows+schema+hash match, err null) in
     the newest CORRECTNESS_r*.json.

Usage: python3 tools/coverage_check.py [repo_root]
Exit 0 when every carrier resolves and is green; 1 otherwise, naming
each offending row and query. Wired into tools/round_check.py.
"""
import glob
import json
import os
import re
import sys


def registry_names(repo):
    """Query names registered in SparkEntry.queries, e.g. q01_current_qty.
    Parsed from the source: every string-literal map key of the form
    qNN_name followed by ->. SparkEntry delegates some entries to
    per-module maps (PipelineQueries.queries etc.), so scan all of
    src/main/scala for registration-shaped literals."""
    names = set()
    for path in glob.glob(os.path.join(repo, "src/main/scala/**/*.scala"),
                          recursive=True):
        src = open(path, encoding="utf-8").read()
        names |= set(re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->', src))
    return names


def newest_correctness(repo):
    files = glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    if not files:
        return None, {}
    def rnum(p):
        m = re.search(r"CORRECTNESS_r(\d+)", p)
        return int(m.group(1)) if m else -1
    path = max(files, key=rnum)
    return path, json.load(open(path))


def coverage_carriers(repo):
    """(row_id, carrier_prefix) pairs from EVERY COVERAGE.md table that
    has a Query column. Header-aware: the column index comes from each
    table's own header row, so the §2 operator tables (ID|Operator|
    Implementation|Query|Test) and the later capability tables
    (Capability|...|Query|...) are all checked, wherever the Query
    column sits."""
    out = []
    qcol = None
    for line in open(os.path.join(repo, "COVERAGE.md"), encoding="utf-8"):
        if not line.startswith("|"):
            qcol = None  # table ended
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if all(set(c) <= {"-", " ", ":"} for c in cells):
            continue  # separator row
        if "Query" in cells:
            qcol = cells.index("Query")
            continue
        if qcol is None or len(cells) <= qcol:
            continue
        for q in re.findall(r"\bq(\d+)\b", cells[qcol]):
            out.append((cells[0], f"q{q}"))
    return out


def main():
    repo = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else ".")
    reg = registry_names(repo)
    by_prefix = {}
    for n in reg:
        by_prefix.setdefault(n.split("_")[0], set()).add(n)
    cpath, correctness = newest_correctness(repo)
    green = {k.split("_")[0] for k, v in correctness.items()
             if v.get("rows_match") and v.get("schema_match")
             and v.get("hash_match") and not v.get("err")}
    carriers = coverage_carriers(repo)
    problems = []
    for row_id, q in carriers:
        if q not in by_prefix:
            problems.append(f"{row_id}: carrier {q} not in SparkEntry.queries")
        elif correctness and q not in green:
            problems.append(
                f"{row_id}: carrier {q} ({', '.join(sorted(by_prefix[q]))}) "
                f"is not green in {os.path.basename(cpath)}")
    for p in problems:
        print(p)
    rows = len({r for r, _ in carriers})
    qs = len({q for _, q in carriers})
    verdict = "FAIL" if problems else "pass"
    print(f"coverage_check {verdict}: {rows} COVERAGE rows, {qs} distinct "
          f"carriers vs {len(reg)} registered queries, "
          f"{len(problems)} problem(s)"
          + (f", correctness={os.path.basename(cpath)}" if cpath else ""))
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
