#!/usr/bin/env python3
"""Round-close consistency gates: the two hand checks the judge runs,
as a script, so a false claim can't ship.

1. Docstring spec-claims — every "XSpec pins/asserts/proves ..."
   sentence in main (non-test) Scala source must name a test suite
   that actually exists under src/test. Emits the claim table
   (file:line  suite  OK/MISSING).

2. SURVEY §2.3 ↔ registry cross-check — the query names declared in
   SURVEY.md's §2.3 tables must equal the keys of
   `SparkEntry.oracleSql` (as dumped by any `graft.Verify` run's
   oracle_sql.json), in BOTH directions.

3. Ceiling coverage — every registry query must carry a
   `Bench.BaselineSec` entry (the ceiling protocol: recorded the same
   round the query lands), and no ceiling may be orphaned.

Usage:
    python3 scripts/round_close_checks.py [path/to/oracle_sql.json]

oracle_sql.json defaults to /tmp/verify_out/oracle_sql.json (the
verify recipe's output). Exit 0 iff all three checks are clean.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(REPO, "src/main/scala")
TEST = os.path.join(REPO, "src/test/scala")
SURVEY = os.path.join(REPO, "SURVEY.md")

# a docstring claim = a suite name followed (within the sentence) by a
# claim verb; ".scala:NN" cites are matched too
CLAIM = re.compile(
    r"\b([A-Z]\w*(?:Spec|PropSpec))\b(?:\.scala)?(?::\d+)?"
    r"[^.]{0,120}?\b(pins|pinned|asserts|proves|covers|verifies)\b")


def scala_files(root):
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(".scala"):
                yield os.path.join(dirpath, n)


def check_claims():
    suites = {os.path.splitext(os.path.basename(p))[0]
              for p in scala_files(TEST)}
    rows, bad = [], 0
    for path in scala_files(MAIN):
        text = open(path, encoding="utf-8").read()
        # docstrings/comments only: strip code lines? Claims live in
        # comments; matching the whole file is fine (a suite name in
        # code would be a test dependency, which main code never has).
        for m in CLAIM.finditer(text):
            line = text.count("\n", 0, m.start()) + 1
            suite, ok = m.group(1), m.group(1) in suites
            rows.append((os.path.relpath(path, REPO), line, suite,
                         m.group(2), ok))
            bad += 0 if ok else 1
    print(f"== docstring spec-claims ({len(rows)} found) ==")
    for path, line, suite, verb, ok in rows:
        print(f"  {'OK     ' if ok else 'MISSING'} {path}:{line}  "
              f"{suite} {verb}")
    return bad


def survey_names():
    lines = open(SURVEY, encoding="utf-8").read().splitlines()
    # §2.3 spans from its header to the next "## " header
    start = next(i for i, l in enumerate(lines)
                 if l.startswith("### 2.3 "))
    end = next(i for i in range(start + 1, len(lines))
               if lines[i].startswith("## "))
    names = []
    for l in lines[start:end]:
        m = re.match(r"\| `([a-z0-9_]+)`", l)
        if m:
            names.append(m.group(1))
    dupes = {n for n in names if names.count(n) > 1}
    return set(names), dupes


def check_survey(oracle_path):
    declared, dupes = survey_names()
    registry = set(json.load(open(oracle_path)))
    only_survey = sorted(declared - registry)
    only_registry = sorted(registry - declared)
    print(f"== SURVEY §2.3 ({len(declared)}) ↔ oracleSql "
          f"({len(registry)}) ==")
    if dupes:
        print(f"  DUPED in SURVEY: {sorted(dupes)}")
    for n in only_survey:
        print(f"  SURVEY-ONLY   {n}")
    for n in only_registry:
        print(f"  REGISTRY-ONLY {n}")
    if not (dupes or only_survey or only_registry):
        print("  clean in both directions")
    return len(dupes) + len(only_survey) + len(only_registry)


def baseline_keys():
    text = open(os.path.join(
        MAIN, "graft/Bench.scala"), encoding="utf-8").read()
    # strip line comments first — entry annotations quote old values
    # with parens ("(15.51 -> 9.41, -39%)") that fool paren tracking
    text = re.sub(r'//[^\n]*', '', text)
    start = text.index("BaselineSec: Map[String, Double] = Map(")
    # walk to the Map(...)'s balanced closing paren: a first-value-
    # followed-by-paren regex silently truncated the key set under
    # reformats (e.g. `Map(...) ++ overrides`, a paren after a value
    # mid-map), weakening the ceiling-coverage gate
    open_idx = text.index("Map(", start) + len("Map(") - 1
    depth = 0
    end = None
    for i in range(open_idx, len(text)):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    if end is None:
        raise ValueError("BaselineSec Map( literal never closes")
    return set(re.findall(r'"([a-z0-9_]+)"\s*->', text[start:end]))


def check_ceilings(oracle_path):
    registry = set(json.load(open(oracle_path)))
    ceilings = baseline_keys()
    ungated = sorted(registry - ceilings)
    orphaned = sorted(ceilings - registry)
    print(f"== ceilings ({len(ceilings)}) ↔ registry ({len(registry)}) ==")
    for n in ungated:
        print(f"  NO-CEILING {n}")
    for n in orphaned:
        print(f"  ORPHANED   {n}")
    if not (ungated or orphaned):
        print("  every query gated, no orphans")
    return len(ungated) + len(orphaned)


def main():
    oracle = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/verify_out/oracle_sql.json"
    bad = check_claims()
    if not os.path.exists(oracle):
        print(f"oracle_sql.json not found at {oracle} — run "
              "`sbt \"runMain graft.Verify <sfDir> <outDir>\"` first",
              file=sys.stderr)
        return 2
    bad += check_survey(oracle)
    bad += check_ceilings(oracle)
    print("RESULT:", "clean" if bad == 0 else f"{bad} problem(s)")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
