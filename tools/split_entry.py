#!/usr/bin/env python3
"""One-shot r14 hygiene refactor: split SparkEntry.scala's two giant map
literals (queries + oracleSql) into five per-tier files glued by
concatenation. Pure text surgery — entry blocks are moved verbatim."""
import re, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")  # 0-indexed; file line N = lines[N-1]

ENTRY_RE = re.compile(r'^    "(q_[A-Za-z0-9_]+)" ->')

def find_line(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit("not found")

bq_open = find_line(lambda l: l.startswith("  private def baseQueries"))
bq_close = find_line(lambda l: l == "  )", bq_open)
osql_open = find_line(lambda l: l.startswith("  def oracleSql"), bq_close)
osql_close = find_line(lambda l: l == "  )", osql_open)
print("regions:", bq_open+1, bq_close+1, osql_open+1, osql_close+1)

def parse_entries(lo, hi):
    """Entries in (lo, hi) exclusive of the Map( line and the ) line.
    Returns list of (key, block_lines). Leading section comments attach to
    the entry that follows them."""
    starts = [i for i in range(lo+1, hi) if ENTRY_RE.match(lines[i])]
    entries = []
    for n, s in enumerate(starts):
        end = starts[n+1] if n+1 < len(starts) else hi
        block = lines[s:end]
        # peel trailing comment/blank lines -> they head the NEXT entry
        peel = []
        while n+1 < len(starts) and block and (
                block[-1].strip() == "" or block[-1].lstrip().startswith("//")):
            peel.insert(0, block.pop())
        key = ENTRY_RE.match(lines[s]).group(1)
        entries.append([key, block, peel])
    # re-attach peels as headers of following entry
    out = []
    carry = []
    # first entry may have headers between Map( and it
    pre = lines[lo+1:starts[0]]
    for n, (key, block, peel) in enumerate(entries):
        hdr = pre if n == 0 else carry
        carry = peel
        # ensure block's last non-blank line ends with a comma
        for j in range(len(block)-1, -1, -1):
            if block[j].strip():
                if not block[j].rstrip().endswith(","):
                    block[j] = block[j].rstrip() + ","
                break
        out.append((key, hdr + block))
    return out

q_entries = parse_entries(bq_open, bq_close)
o_entries = parse_entries(osql_open, osql_close)
qk = [k for k, _ in q_entries]
ok = [k for k, _ in o_entries]
print("query entries:", len(qk), "oracle entries:", len(ok))
assert len(set(qk)) == len(qk) and len(set(ok)) == len(ok)
assert set(ok) <= set(qk), sorted(set(ok) - set(qk))

# tier boundaries (1-based line numbers of section markers, from outline)
REL_LO, TEXT_LO, GRAPH_LO, CHUNK4_LO = 1397, 1933, 3978, 4003
start_of = {k: find_line(lambda l, k=k: ENTRY_RE.match(l) and
                         ENTRY_RE.match(l).group(1) == k, bq_open) + 1
            for k in qk}

def tier(key):
    if key.startswith("q_stream"):
        return "Stream"
    ln = start_of[key]
    if ln < REL_LO: return "Cube"
    if ln < TEXT_LO: return "Relational"
    if ln < GRAPH_LO: return "Text"
    if ln < CHUNK4_LO: return "Cube"       # process-graph compiler rows
    return "Lakehouse"

tiers = ["Cube", "Relational", "Text", "Lakehouse", "Stream"]
assign = {k: tier(k) for k in qk}
from collections import Counter
print(Counter(assign.values()))

HDR = """package graft

import graft.cube.{Cube, CubeMeta, Dim, GridRef}
import graft.functions.{CurveFit, ScalarExpr}
import graft.ops._
import graft.text.{Classifier, Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntry._

/** %s tier of the driver-contract query surface (r14 hygiene split of
  * SparkEntry's single 10.7k-line file; zero behavior change). Each tier
  * object contributes a `q` (queries) and `sql` (DuckDB oracle) map;
  * `SparkEntry.queries`/`SparkEntry.oracleSql` concatenate the tiers.
  * Shared helpers stay on SparkEntry as `private[graft]`. */
private[graft] object Queries%s {

  def q: Map[String, Q] = Map(
"""

for t in tiers:
    body = []
    for k, blk in q_entries:
        if assign[k] == t:
            body.extend(blk)
    sql_body = []
    for k, blk in o_entries:
        if assign[k] == t:
            sql_body.extend(blk)
    txt = (HDR % (t, t)) + "\n".join(body) + "\n  )\n\n" + \
          "  def sql: Map[String, String] = Map(\n" + \
          "\n".join(sql_body) + "\n  )\n}\n"
    open(f"src/main/scala/graft/Queries{t}.scala", "w").write(txt)
    print(f"Queries{t}.scala", txt.count("\n"), "lines")

# rewrite SparkEntry: replace both literals with concatenation
cat_q = ("  private def baseQueries: Map[String, Q] =\n    " +
         " ++ ".join(f"Queries{t}.q" for t in tiers))
cat_o = ("  def oracleSql: Map[String, String] =\n    " +
         " ++ ".join(f"Queries{t}.sql" for t in tiers))
new = lines[:bq_open] + [cat_q] + lines[bq_close+1:osql_open] + [cat_o] + \
      lines[osql_close+1:]
# widen object-level private members so tier files can reach them
W = re.compile(r"^(  )private (def|val|lazy val|type|object)")
new = [W.sub(r"\1private[graft] \2", l) for l in new]
open(SRC, "w").write("\n".join(new))
print("SparkEntry.scala now", len(new), "lines")
