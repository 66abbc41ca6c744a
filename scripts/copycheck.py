"""Similarity audit of every repo source file against the reference
(VERDICT r4 #8: the round-end COPYCHECK.json should carry per-file
evidence, not just an empty flag list an unrun detector would also
emit).

Method: normalised line sets + difflib ratios.  For each repo .py/.cpp
source, compute (a) the Jaccard overlap of its normalised non-trivial
line set with each reference file, and (b) for the best candidate, the
difflib.SequenceMatcher ratio over the normalised text.  Files above
the threshold on either metric are flagged.  Lines are normalised by
stripping whitespace/comments; lines shorter than 8 chars are dropped
(brackets, 'else:', etc.).

Writes COPYCHECK.json: {threshold, files: {path: {best_ref, jaccard,
ratio}}, flagged: [...]}.
"""

import difflib
import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference")
THRESHOLD = 0.6


def norm_lines(text):
    out = []
    for ln in text.splitlines():
        ln = re.sub(r"#.*$", "", ln).strip()
        ln = re.sub(r"\s+", " ", ln)
        if len(ln) >= 8:
            out.append(ln)
    return out


def main():
    refs = {}
    for p in sorted(REF.rglob("*")):
        if p.suffix in (".py", ".c", ".cpp", ".h"):
            lines = norm_lines(p.read_text(errors="replace"))
            refs[str(p.relative_to(REF))] = (set(lines), "\n".join(lines))

    results = {}
    flagged = []
    sources = [p for pat in ("joxsz_tpu/**/*.py", "native/**/*.cpp",
                             "native/**/*.h", "scripts/*.py",
                             "tests/*.py", "*.py")
               for p in sorted(REPO.glob(pat))]
    for p in sources:
        rel = str(p.relative_to(REPO))
        lines = norm_lines(p.read_text(errors="replace"))
        if not lines:
            continue
        lset = set(lines)
        best_name, best_j = None, 0.0
        for rname, (rset, _) in refs.items():
            inter = len(lset & rset)
            j = inter / max(1, min(len(lset), len(rset)))
            if j > best_j:
                best_j, best_name = j, rname
        ratio = 0.0
        if best_name is not None and best_j > 0.05:
            ratio = difflib.SequenceMatcher(
                None, "\n".join(lines), refs[best_name][1]).ratio()
        entry = {"best_ref": best_name, "jaccard": round(best_j, 3),
                 "ratio": round(ratio, 3), "lines": len(lines)}
        results[rel] = entry
        if best_j > THRESHOLD or ratio > THRESHOLD:
            flagged.append(rel)

    worst = sorted(results.items(),
                   key=lambda kv: -max(kv[1]["jaccard"], kv[1]["ratio"]))
    out = {
        "threshold": THRESHOLD,
        "method": "normalised-line Jaccard (vs min set) + difflib ratio "
                  "per repo source vs every reference source; see "
                  "scripts/copycheck.py",
        "n_files_checked": len(results),
        "flagged": flagged,
        "top10_most_similar": {k: v for k, v in worst[:10]},
        "files": results,
    }
    (REPO / "COPYCHECK.json").write_text(json.dumps(out, indent=1))
    print(f"checked {len(results)} files; flagged: {flagged}")
    for k, v in worst[:10]:
        print(f"  {k}: jaccard {v['jaccard']} ratio {v['ratio']} "
              f"vs {v['best_ref']}")


if __name__ == "__main__":
    main()
