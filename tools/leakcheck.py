#!/usr/bin/env python3
"""Repo-side leak scan (builder-side tooling only — the shipped library
has no Python dependency).

Greps the shipped tree for the seven categories the round gate checks
(internal package imports, internal URLs/hosts, storage buckets, chat
links, API-key material, internal env vars) and writes LEAKCHECK.json.

Unlike a hand-bumped artifact, every run stamps the scanned commit hash,
dirty-tree flag, and a UTC timestamp into the JSON, so a round-number
bump provably corresponds to a fresh scan of a specific tree.

Usage: python3 tools/leakcheck.py <round> [repo_root]
"""
import json
import os
import re
import subprocess
import sys
from datetime import datetime, timezone

# Patterns are intentionally broad: anything that smells like a private
# registry, internal host, cloud bucket, chat permalink, or credential.
PATTERNS = {
    "internal-import": r"(import|require|from)\s+[\"']?(com\.anthropic|anthropic[._-]internal|internal\.)",
    "internal-url": r"https?://[a-z0-9.-]*\b(internal|corp|intranet)\b",
    "internal-pkg2": r"\b(claude[-_]cli[-_]internal|anthropics/)",
    "internal-bucket": r"\b(s3|gs|gcs|abfss?)://[a-z0-9.-]*(internal|corp|private)",
    "slack-link": r"https?://[a-z0-9-]+\.slack\.com/|#[a-z0-9-]*claude[a-z0-9-]*",
    "api-key": r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|api[_-]?key\s*[:=]\s*[\"'][A-Za-z0-9_-]{16,})",
    "axon-env": r"\b[A-Z_]*(ANTHROPIC|CLAUDE)[A-Z_]*=",
}

SCAN_DIRS = ["src", "tools", "docs"]
SCAN_FILES = ["build.sbt", "README.md", "SURVEY.md", "BASELINE.md"]
SKIP_EXT = {".class", ".jar", ".parquet", ".crc"}


def git(root, *args):
    return subprocess.run(["git", "-C", root] + list(args),
                          capture_output=True, text=True).stdout.strip()


def files_to_scan(root):
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(root, d)):
            if "target" in dirpath:
                continue
            for n in names:
                if os.path.splitext(n)[1] not in SKIP_EXT:
                    yield os.path.join(dirpath, n)
    for f in SCAN_FILES:
        p = os.path.join(root, f)
        if os.path.exists(p):
            yield p


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    compiled = {k: re.compile(v, re.IGNORECASE) for k, v in PATTERNS.items()}
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    self_path = os.path.abspath(__file__)
    for path in files_to_scan(root):
        if os.path.abspath(path) == self_path:
            continue  # the pattern table matches itself
        try:
            with open(path, errors="replace") as fh:
                text = fh.read()
        except OSError:
            continue
        n_files += 1
        rel = os.path.relpath(path, root)
        for lineno, line in enumerate(text.splitlines(), 1):
            for cat, rx in compiled.items():
                if rx.search(line):
                    hits[cat].append(f"{rel}:{lineno}: {line.strip()[:160]}")
    out = {
        "round": rnd,
        "commit": git(root, "rev-parse", "HEAD"),
        "dirty": bool(git(root, "status", "--porcelain")),
        "scanned_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(root, "LEAKCHECK.json"), "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
