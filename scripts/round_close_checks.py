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

0. Input freshness — the oracle_sql.json handed in must carry exactly
   the SURVEY §2.3 surface; a stale pre-refresh dump fails loudly
   ("stale oracle_sql.json?") instead of confidently mis-reporting
   the new queries as orphaned ceilings (round-19 judge finding).

4. Round-close artifact trail — the CURRENT round's TESTS_rN.json and
   CHECKS_rN.txt must exist at HEAD (round 18 shipped its "255/255,
   gates clean" claim only in commit messages; the judge had to re-run
   sbt to re-establish it). N defaults to max(CORRECTNESS_r*.json)+1 —
   the driver commits round N-1's correctness artifact before round N
   builds — and can be overridden with `--round N`.

Usage:
    python3 scripts/round_close_checks.py [path/to/oracle_sql.json] \
        [--round N]

oracle_sql.json defaults to /tmp/verify_out/oracle_sql.json (the
verify recipe's output). Exit 0 iff all four checks are clean.

Chicken-and-egg note: CHECKS_rN.txt IS this script's captured output,
so the canonical close sequence is: run with artifacts present from a
previous invocation (or tee the run into CHECKS_rN.txt and re-run —
the second run gates the first's capture).
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


def current_round():
    ns = []
    for name in os.listdir(REPO):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", name)
        if m:
            ns.append(int(m.group(1)))
    return max(ns) + 1 if ns else None


def check_artifacts(rnd):
    if rnd is None:
        print("== round artifacts: no CORRECTNESS_r*.json to infer the "
              "round from — pass --round N ==")
        return 1
    missing = 0
    print(f"== round-{rnd} close artifacts at HEAD ==")
    for name in (f"TESTS_r{rnd}.json", f"CHECKS_r{rnd}.txt"):
        ok = os.path.exists(os.path.join(REPO, name))
        print(f"  {'OK     ' if ok else 'MISSING'} {name}")
        missing += 0 if ok else 1
    return missing


def check_freshness(oracle_path):
    """Stale-input gate (round-20, closing the round-19 judge finding):
    a pre-refresh oracle_sql.json silently validated last round's
    surface and reported the NEW queries as ORPHANED ceilings — a gate
    that can consume stale input isn't a gate. The dump must carry
    exactly the SURVEY §2.3 surface before any orphan/coverage verdict
    is trusted; on mismatch, fail loudly naming the likely cause.
    """
    declared, _ = survey_names()
    registry = set(json.load(open(oracle_path)))
    if registry != declared:
        print(f"stale oracle_sql.json? ({len(registry)} dump vs "
              f"{len(declared)} survey) — re-run "
              "`sbt \"runMain graft.Verify <sfDir> <outDir>\"` at HEAD "
              f"before trusting orphan/coverage results from {oracle_path}",
              file=sys.stderr)
        return 1
    return 0


USAGE = ("usage: python3 scripts/round_close_checks.py "
         "[path/to/oracle_sql.json] [--round N]")


def main():
    args = list(sys.argv[1:])
    rnd = None
    if "--round" in args:
        i = args.index("--round")
        # a bare or non-numeric --round must print usage, not a
        # traceback (round-19 advisory)
        if i + 1 >= len(args) or not args[i + 1].isdigit():
            print(USAGE, file=sys.stderr)
            print("--round requires a numeric value", file=sys.stderr)
            return 2
        rnd = int(args[i + 1])
        del args[i:i + 2]
    if rnd is None:
        rnd = current_round()
    oracle = args[0] if args else "/tmp/verify_out/oracle_sql.json"
    bad = check_claims()
    if not os.path.exists(oracle):
        print(f"oracle_sql.json not found at {oracle} — run "
              "`sbt \"runMain graft.Verify <sfDir> <outDir>\"` first",
              file=sys.stderr)
        return 2
    # a survey↔registry mismatch SHORT-CIRCUITS the ceiling check:
    # running it on a (likely stale) dump would print misleading
    # ORPHANED lines — the round-19 incident the freshness gate exists
    # to prevent. check_survey still runs first so a GENUINE drift
    # shows its per-name detail; the stale hint names the likely cause.
    if check_survey(oracle):
        check_freshness(oracle)
        print("RESULT: survey/registry mismatch — ceiling check skipped "
              "(stale oracle_sql.json? re-dump at HEAD and re-run)")
        return 1
    bad += check_ceilings(oracle)
    bad += check_artifacts(rnd)
    print("RESULT:", "clean" if bad == 0 else f"{bad} problem(s)")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
