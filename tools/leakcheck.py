#!/usr/bin/env python3
"""Repo leak scan: greps the source tree and docs for string shapes
that must never appear in a public engine (internal-namespace imports,
private URLs/buckets, chat permalinks, credential-shaped tokens,
internal env vars). Writes LEAKCHECK.json with a run timestamp and the
scanned-file count so a stale artifact or a counter-only bump can't
masquerade as a fresh run.

Usage: python3 tools/leakcheck.py [round_number]
"""
import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Pattern keys mirror the longstanding LEAKCHECK.json categories; the
# regexes are shape-based (no concrete private names belong in a public
# scanner either).
PATTERNS = {
    "internal-import": re.compile(
        r"^\s*(?:import|from)\s+[\w.]*\.(?:internal|corp|proprietary)\b",
        re.M),
    "internal-url": re.compile(
        r"https?://[a-z0-9.-]*\.(?:corp|internal|intranet)\b", re.I),
    "internal-pkg2": re.compile(
        r"\b(?:libraryDependencies|pip install|npm install)\b[^\n]*"
        r"(?:internal|corp-)", re.I),
    "internal-bucket": re.compile(
        r"\b(?:s3|gs|abfss?)://[a-z0-9.-]*(?:internal|corp|private)",
        re.I),
    "slack-link": re.compile(
        r"[a-z0-9-]+\.slack\.com/archives/[A-Z0-9/]+"),
    "api-key": re.compile(
        r"\b(?:sk|ak|ghp|xox[bap])-[A-Za-z0-9_-]{20,}\b"),
    "axon-env": re.compile(
        r"\b[A-Z][A-Z0-9_]*(?:AXON|INTERNAL_ONLY)[A-Z0-9_]*="),
}

SCAN_EXT = {".scala", ".py", ".md", ".sbt", ".json", ".sql", ".sh",
            ".conf", ".properties", ".txt"}
SKIP_DIRS = {".git", "target", "project", ".bloop", ".metals", ".idea"}


def scan():
    hits = {k: [] for k in PATTERNS}
    scanned = 0
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for name in filenames:
            if os.path.splitext(name)[1] not in SCAN_EXT:
                continue
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, ROOT)
            if rel == os.path.join("tools", "leakcheck.py"):
                continue  # the patterns themselves live here
            try:
                with open(path, encoding="utf-8", errors="replace") as f:
                    text = f.read()
            except OSError:
                continue
            scanned += 1
            for key, pat in PATTERNS.items():
                for m in pat.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[key].append(f"{rel}:{line}")
    return scanned, hits


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    scanned, hits = scan()
    out = {
        "round": rnd,
        "run_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "generator": "tools/leakcheck.py",
        "scanned_files": scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"LEAKCHECK: {out['n_hits']} hits across {scanned} files "
          f"at {out['run_ts']}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
