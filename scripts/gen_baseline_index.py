#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query index table.

Usage:
    python3 scripts/gen_baseline_index.py <bench_json> [BASELINE.md]

<bench_json> is a file holding graft.Bench's FULL output line (the one
with the per-query "steady" map — e.g. bench_local_r13.json captured
from a local quiet-host run; the driver artifact BENCH_r*.json keeps
only a 2000-char tail and usually cannot be used).

For every query in the steady map the script emits one row:
    | <query> | <steady s, 2dp> | <latest BASELINE.md section whose
                                   body mentions the query, or "—"> |
"Latest" = the LAST "## " section in file order, excluding the Index
section itself. The table is spliced in place between the Index
section's header row and the next "## " heading; everything else in
the file is preserved byte-for-byte. Re-run whenever a round closes
with a fresh full bench line or new per-query sections are added.
"""
import json
import re
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    bench_path = sys.argv[1]
    md_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"

    steady = None
    with open(bench_path) as f:
        for line in f:
            # sbt-captured lines carry an "[info] " prefix — parse from
            # the first brace, not from column 0
            brace = line.find("{")
            if brace < 0:
                continue
            try:
                obj = json.loads(line[brace:].strip())
            except json.JSONDecodeError:
                continue
            if isinstance(obj.get("steady"), dict):
                steady = obj["steady"]
    if steady is None:
        print(f"error: no line with a 'steady' map in {bench_path}")
        return 1

    # read FIRST, then write (the round-9 truncate-before-read trap)
    with open(md_path) as f:
        md = f.read()

    # sections: (title, body) in file order, Index section excluded
    parts = re.split(r"^## (.+)$", md, flags=re.M)
    sections = []  # (title, body)
    for i in range(1, len(parts), 2):
        title = parts[i].strip()
        if title.startswith("Index:"):
            continue
        sections.append((title, parts[i + 1]))

    def anchor(q: str) -> str:
        # Sections cite queries either bare ("q200") or by full name
        # ("q200_farthest_init"). Underscore is a word character, so a
        # \b-anchored bare pattern can NEVER match the full-name form;
        # match the number and allow an optional suffix instead, while
        # (?![0-9]) keeps q20 from matching q200.
        base = q.split("_")[0]
        pat = re.compile(r"(?<!\w)" + re.escape(base) + r"(?![0-9])")
        last = None
        for title, body in sections:
            if pat.search(body) or pat.search(title):
                last = title
        if last is None:
            return "—"
        return last if len(last) <= 56 else last[:56] + "…"

    rows = ["| query | steady s | latest section mentioning it |",
            "|---|---|---|"]
    def qnum(q: str):
        m = re.match(r"q(\d+)", q)
        return (int(m.group(1)) if m else 10**9, q)

    for q in sorted(steady, key=qnum):
        s = steady[q]
        val = f"{s:.2f}" if isinstance(s, (int, float)) and s >= 0 else "-1"
        rows.append(f"| {q} | {val} | {anchor(q)} |")
    table = "\n".join(rows)

    # splice: replace the contiguous table inside the Index section
    m = re.search(
        r"(^## Index:[^\n]*\n(?:(?!^\|)(?!^## ).*\n)*)"  # prose up to table
        r"((?:^\|.*\n)+)",                                # the old table
        md, flags=re.M)
    if not m:
        print(f"error: Index section/table not found in {md_path}")
        return 1
    md_new = md[:m.start(2)] + table + "\n" + md[m.end(2):]
    with open(md_path, "w") as f:
        f.write(md_new)
    print(f"wrote {len(steady)} index rows to {md_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
