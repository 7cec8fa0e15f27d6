#!/usr/bin/env python3
"""Generate the chunk-parity fixture by running the REFERENCE chunker
(/root/reference/preprocessing/chunk_text_files.py — imported, not
reimplemented) over deterministic case constructions from the sf0.01
documents table. ChunkerParitySpec rebuilds the same cases in Scala,
runs Chunker.chunkParity, and compares md5 + line spans chunk-for-chunk.

Usage: python3 scripts/gen_chunk_parity_fixture.py
Writes: src/test/resources/chunk_parity_fixture.tsv
  (case_key \t chunk_idx \t md5 \t start_line \t end_line; a case with
  zero chunks emits one row with idx -1)
"""
import sys, json, hashlib
import duckdb

sys.path.insert(0, "/root/reference/preprocessing")
from chunk_text_files import create_chunks  # noqa: E402

rows = duckdb.sql(
    "SELECT doc_id, source, text FROM "
    "read_parquet('/root/testdata/sf0.01/documents.parquet') "
    "ORDER BY doc_id").fetchall()
by_id = {r[0]: r[2] for r in rows}
ids = sorted(by_id)

cases = {}
# 1. every raw doc (short/trivial path)
for i in ids:
    cases[f"doc_{i}"] = by_id[i]
# 2. multi-paragraph packing + overlap fold
for k in range(40):
    group = [by_id[i] for i in ids if 12 * k <= i < 12 * (k + 1)]
    if group:
        cases[f"long_{k}"] = "\n\n".join(group)
# 3. one giant paragraph with sentences -> sentence post-split path
for k in range(20):
    group = [by_id[i] for i in ids if 25 * k <= i < 25 * (k + 1)]
    if group:
        cases[f"sent_{k}"] = ". ".join(group) + "."
# 4. conversational K:/V: dialogs per source (first 30 docs each)
sources = {}
for doc_id, source, text in rows:
    sources.setdefault(source, []).append(text)
for s, texts in sorted(sources.items()):
    turns = [("K: " if j % 2 == 0 else "V: ") + t
             for j, t in enumerate(texts[:30])]
    cases[f"conv_{s}"] = "\n".join(turns)
# 5. md5-seeded property cases (round 8): randomized paragraph/sentence/
# dialog shapes truncated to lengths straddling the 500 (min_chunk) and
# 2000 (max_chunk) boundaries, so boundary drift cannot hide between
# fixture regenerations. md5-derived choices reproduce identically in
# the Scala spec without sharing an RNG (the repo's standard idiom);
# corpus text is pure ASCII, so python slicing == Scala take.
SIZES = [0, 450, 480, 499, 500, 501, 520, 550,
         1900, 1990, 1999, 2000, 2001, 2010, 2100, 2500]
for k in range(420):
    h = hashlib.md5(f"parity:{k}".encode()).hexdigest()
    shape = int(h[0], 16) % 3
    n_parts = 2 + int(h[1], 16) % 6
    parts = [by_id[ids[int(h[2 + 2 * j:4 + 2 * j], 16) % len(ids)]]
             for j in range(n_parts)]
    if shape == 0:
        txt = "\n\n".join(parts)
    elif shape == 1:
        txt = ". ".join(parts) + "."
    else:
        txt = "\n".join(("K: " if j % 2 == 0 else "V: ") + p
                        for j, p in enumerate(parts))
    size = SIZES[int(h[16], 16) % len(SIZES)]
    cases[f"rand_{k}"] = txt[:size] if size else txt

multi = total = 0
with open("src/test/resources/chunk_parity_fixture.tsv", "w") as f:
    for key in sorted(cases):
        chunks = create_chunks(cases[key])
        if len(chunks) > 1:
            multi += 1
        total += len(chunks)
        if not chunks:
            f.write(f"{key}\t-1\t\t0\t0\n")
        for j, c in enumerate(chunks):
            md5 = hashlib.md5(c[0].encode()).hexdigest()
            f.write(f"{key}\t{j}\t{md5}\t{c[1]}\t{c[2]}\n")
print(f"{len(cases)} cases, {multi} multi-chunk, {total} chunks total")
