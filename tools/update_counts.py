#!/usr/bin/env python3
"""Rewrite the spec/query counts stated in README.md from build artifacts,
so prose can't drift from reality (r14 verdict #6: README said "477 specs"
while the reports showed 499 tests; PROGRESS headers disagreed with the
registry). Counts come from:

  - ScalaTest XML reports (target/test-reports/TEST-*.xml): suite count and
    summed testcase count,
  - the gate's Verify output dir (one result dir per query that RAN —
    the same source of truth the shrink check uses).

Run by gate.sh after tests + verify; also runnable standalone. Idempotent:
rewrites the single generated sentence in place. Fails loudly (exit 1) if
an expected artifact or the marker line is missing — a silent skip would
reintroduce exactly the drift this exists to stop.
"""
import glob
import os
import re
import sys
import xml.etree.ElementTree as ET

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def spec_counts():
    reports = glob.glob(os.path.join(ROOT, "target/test-reports/TEST-*.xml"))
    if not reports:
        sys.exit("update_counts: no test reports under target/test-reports "
                 "— run sbt test first")
    suites, tests = 0, 0
    for p in reports:
        r = ET.parse(p).getroot()
        suites += 1
        tests += int(r.get("tests", 0))
    return suites, tests


def query_count(verify_dir):
    n = sum(os.path.isdir(p) for p in glob.glob(os.path.join(verify_dir, "*")))
    if n == 0:
        sys.exit(f"update_counts: no query result dirs in {verify_dir} "
                 "— run Verify first")
    return n


def main():
    verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_gate"
    suites, tests = spec_counts()
    queries = query_count(verify_dir)
    readme = os.path.join(ROOT, "README.md")
    text = open(readme, encoding="utf-8").read()
    # the one generated sentence: "`sbt test`: N specs in M suites, and Q
    # oracle-gated queries" — counts injected here, prose owned by the line
    pat = re.compile(r"- `sbt test`: \d+ specs(?: in \d+ suites)?"
                     r"(?:, and \d+ oracle-gated queries)? —")
    repl = (f"- `sbt test`: {tests} specs in {suites} suites, "
            f"and {queries} oracle-gated queries —")
    new, n = pat.subn(repl, text)
    if n != 1:
        sys.exit(f"update_counts: expected exactly 1 generated-counts line "
                 f"in README.md, found {n} — marker drifted")
    # the intro's query count drifts too — own it here
    intro = re.compile(r"\(\d+ named queries, ALL \d+ with DuckDB oracles\)")
    new, n2 = intro.subn(
        f"({queries} named queries, ALL {queries} with DuckDB oracles)", new)
    if n2 != 1:
        sys.exit(f"update_counts: expected exactly 1 intro query-count line "
                 f"in README.md, found {n2} — marker drifted")
    if new != text:
        open(readme, "w", encoding="utf-8").write(new)
        print(f"update_counts: README.md -> {tests} specs / {suites} suites / "
              f"{queries} queries")
    else:
        print(f"update_counts: README.md already current ({tests} specs / "
              f"{suites} suites / {queries} queries)")


if __name__ == "__main__":
    main()
