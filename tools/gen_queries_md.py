#!/usr/bin/env python3
"""Regenerate QUERIES.md from the query registries' source.

For every `"qNNN_name"` QueryDef literal, emits one line with:
  - the defining file:line (clickable navigation for a reviewer),
  - the oracle kind (hash = DuckDB hash-match, rows-only, or twin
    when the rows-only query names a hash-green structural twin),
  - whether Bench times it (headline / scale section),
  - a summary: the first sentence of the QueryDef's scaladoc, which
    by repo convention names the operator and its scale knob.

Run from the repo root: python3 tools/gen_queries_md.py > QUERIES.md
"""
import re
import sys
from pathlib import Path

QUERY_DIR = Path("src/main/scala/graft/queries")
ENTRY = Path("src/main/scala/graft/SparkEntry.scala")

# rows-only queries and their anchoring twin (VERDICT r8 table;
# q46 left this list in round 15 — re-expressed over the PortableHash
# KMV, it now carries its own estimate-replaying oracle)
TWINS = {
    "q21_scrape_pipeline": "q67_parse_oracle",
    "q24_scrape_bench": "q67_parse_oracle",
}

SCALE_BENCH = re.compile(r'"(q\d+[a-z0-9_]*)",?\s*$')


def first_sentence(doc: str) -> str:
    text = " ".join(
        ln.strip().lstrip("*").strip() for ln in doc.splitlines())
    text = re.sub(r"\[\[([^\]]+)\]\]", lambda m: m.group(1).split(".")[-1],
                  text)
    text = re.sub(r"\s+", " ", text).strip()
    # first sentence, but never cut inside (...) and keep it short-ish
    depth, out = 0, []
    for i, ch in enumerate(text):
        out.append(ch)
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch in ".!?" and depth == 0 and len(out) > 30:
            # a period inside a number ("j >= 0.8") is not a sentence end
            if ch == "." and i + 1 < len(text) and text[i + 1].isdigit():
                continue
            break
    s = "".join(out).strip()
    return (s[:220] + "…") if len(s) > 221 else s


def scala_files():
    yield from sorted(QUERY_DIR.glob("*.scala"))


def bench_sets():
    src = ENTRY.read_text()
    scale = set(re.findall(r'"(q\d+[a-z0-9_]*)"', src.split(
        "scaleBenchNames")[1].split(")")[0])) if "scaleBenchNames" in src \
        else set()
    return scale


def main():
    scale_bench = bench_sets()
    rows = {}
    for path in scala_files():
        src = path.read_text()
        lines = src.splitlines()
        for i, line in enumerate(lines):
            m = re.search(r'^\s*"(q\d+[a-z0-9_]*)",\s*$', line)
            if not m:
                continue
            name = m.group(1)
            # oracle kind: scan forward for `oracle = None` / a Some
            block = "\n".join(lines[i:i + 120])
            # the QueryDef block ends at the closing `)` of the literal —
            # detect `oracle = None` before the next QueryDef
            nxt = re.search(r'^\s*"(q\d+[a-z0-9_]*)",\s*$',
                            "\n".join(lines[i + 1:i + 120]), re.M)
            scope = block if not nxt else block[:block.find(nxt.group(0))]
            oracle = "rows-only" if re.search(
                r"oracle\s*=\s*None", scope) else "hash"
            if name in TWINS:
                oracle = f"rows-only (twin: {TWINS[name]})"
            headline = bool(re.search(r"headline\s*=\s*true", scope))
            # scaladoc: the doc block must be ADJACENT to this QueryDef —
            # between `*/` and the `"qNN_name",` line only the `val ...`
            # line, blank lines, and `// ...` separators may appear.
            # Walking back past code would attribute the previous val's
            # doc to an undocumented query (the r9 q30-q34 bug).
            doc = ""
            j = i - 1
            while j >= 0 and "*/" not in lines[j]:
                t = lines[j].strip()
                if t and not t.startswith("//") \
                        and not re.match(r"(private\S* )?val q\d", t):
                    j = -1  # non-trivial code in between: no doc
                    break
                j -= 1
            if j >= 0:
                k = j
                while k >= 0 and "/**" not in lines[k]:
                    k -= 1
                if k >= 0:
                    doc = "\n".join(lines[k:j + 1])
                    doc = doc.replace("/**", "").replace("*/", "")
            bench = "headline" if headline else (
                "scale" if name in scale_bench else "")
            rows[name] = (f"{path}:{i + 1}", oracle, bench,
                          first_sentence(doc) or "—")
    def key(n):
        return int(re.match(r"q(\d+)", n).group(1))
    print("# QUERIES — the graded registry "
          "(generated: python3 tools/gen_queries_md.py)")
    print()
    print("One line per registry entry: where it is defined, how it is"
          " graded (hash = DuckDB hash-match at sf0.01 and the sf0.1"
          " re-grade; rows-only entries name their hash-green structural"
          " twin), which Bench section times it, and the operator/scale"
          "-knob summary from its scaladoc.")
    print()
    print("| name | defined at | oracle | bench | operator / scale knob |")
    print("|---|---|---|---|---|")
    for name in sorted(rows, key=key):
        loc, oracle, bench, summary = rows[name]
        summary = summary.replace("|", "\\|")
        print(f"| {name} | {loc} | {oracle} | {bench} | {summary} |")
    n = len(rows)
    n_hash = sum(1 for r in rows.values() if r[1] == "hash")
    print()
    print(f"{n} queries, {n_hash} hash-checked, "
          f"{sum(1 for r in rows.values() if r[2] == 'headline')} headline-"
          f"benchmarked, {sum(1 for r in rows.values() if r[2] == 'scale')}"
          " scale-benchmarked.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
