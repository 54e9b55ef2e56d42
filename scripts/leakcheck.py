#!/usr/bin/env python3
"""Self-evidencing leak scan (dev-side; the shipped library has no Python
dependency). Greps the tracked source surface for the seven categories the
round gate checks and writes LEAKCHECK.json WITH ITS OWN EVIDENCE: scan
timestamp, scanned-file count, and the commit scanned — so a 0-hit entry
carries proof a scan actually ran rather than a copied counter.

Usage: leakcheck.py [--round N]   (round defaults to the existing file's)
"""
import json, os, re, subprocess, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# category -> regex over file text. Public-knowledge rule: anything that
# looks like a vendor-internal import/URL/bucket/key/env must be absent.
PATTERNS = {
    "internal-import": re.compile(
        r"import\s+(com|net|org)\.(anthropic|openai|google\.internal)\b"),
    "internal-url": re.compile(
        r"https?://[a-z0-9.-]*\.(corp|internal|sandbox)\.[a-z]+"),
    "internal-pkg2": re.compile(
        r"\b[a-z]+\.(internal|proprietary)\.[a-z]+\.[A-Z]\w+"),
    "internal-bucket": re.compile(r"\b(s3|gs|abfss?)://[a-z0-9._-]*"
                                  r"(internal|corp|secret)[a-z0-9._-]*"),
    "slack-link": re.compile(r"slack\.com/archives|go/[a-z-]{2,}\b"),
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|"
                          r"AIza[0-9A-Za-z_-]{35})\b"),
    "axon-env": re.compile(r"\b[A-Z]+_(INTERNAL|CORP)_[A-Z_]+\b"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".conf"}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, check=True,
                         capture_output=True, text=True).stdout
    for rel in out.splitlines():
        if os.path.splitext(rel)[1] in SCAN_EXT and rel != "LEAKCHECK.json":
            yield rel


def main():
    rnd = None
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    prev_path = os.path.join(ROOT, "LEAKCHECK.json")
    if rnd is None and os.path.exists(prev_path):
        with open(prev_path) as f:
            rnd = json.load(f).get("round")

    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for rel in tracked_files():
        try:
            with open(os.path.join(ROOT, rel), errors="replace") as f:
                text = f.read()
        except OSError:
            continue
        n_files += 1
        for cat, pat in PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}:{m.group(0)[:80]}")

    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    report = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_files_scanned": n_files,
        "commit": commit,
    }
    with open(prev_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"leakcheck: {report['n_hits']} hits over {n_files} files "
          f"at {commit[:12]} ({report['scanned_at']})")
    return 0 if report["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
