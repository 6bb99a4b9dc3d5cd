"""Round-7 A/B (VERDICT r6 next-round #5): the corpus gates — C4 line
cleaning + Gopher quality/repetition — as interpreted Catalyst array HOFs
(the shipped scan-shaped implementation) vs a fused Arrow-batched Python
gate, over a realistic synthetic document corpus at bench scale.

Both sides compute the same semantics end-to-end (C4 line keep → page
gates → Gopher quality rules on the cleaned text → repetition rules) and
sink survivors' (doc_id, text) to parquet in /dev/shm, so the comparison
includes scan + gate + write.  Run on a quiet machine:

    python BENCH/r7_gates_ab.py [n_docs]
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import tempfile
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
from pyspark.sql import functions as F

from quality_filter.session import get_spark
from quality_filter.textstats import (
    C4_MIN_LINES,
    C4_MIN_WORDS_PER_LINE,
    GOPHER_MAX_BULLET_FRAC,
    GOPHER_MAX_DUP_LINE_CHAR_FRAC,
    GOPHER_MAX_DUP_LINE_FRAC,
    GOPHER_MAX_DUP_PARA_CHAR_FRAC,
    GOPHER_MAX_DUP_PARA_FRAC,
    GOPHER_MAX_ELLIPSIS_FRAC,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_WORD_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORD_HITS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    c4_line_filter,
    gopher_filter,
)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CACHE = Path(__file__).resolve().parent / ".bench_data" / f"docs_{N_DOCS}"

# Java \s is ASCII-only; Python \s is Unicode — spell it out so both
# engines split words identically.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_TERM = re.compile(r'[.!?"]$')
_SYM = re.compile(r"#|\.\.\.|…")
_ELL = re.compile(r"(\.\.\.|…)$")
_PARA = re.compile(r"\n{2,}")
_STOPS = tuple(GOPHER_STOPWORDS)


def _gate_pdf(texts) -> list:
    out = []
    for t in texts:
        t = t or ""
        if "{" in t or "lorem ipsum" in t.lower():
            out.append(None)
            continue
        kept = [
            ln
            for ln in t.split("\n")
            if _TERM.search(ln.rstrip(" "))
            and sum(1 for w in _WS.split(ln) if w) >= C4_MIN_WORDS_PER_LINE
        ]
        if len(kept) < C4_MIN_LINES:
            out.append(None)
            continue
        clean = "\n".join(kept)
        words = [w for w in _WS.split(clean) if w]
        wc = len(words)
        wc1 = float(max(1, wc))
        if not (GOPHER_MIN_WORDS <= wc <= GOPHER_MAX_WORDS):
            out.append(None)
            continue
        mean_wl = sum(len(w) for w in words) / wc1
        if not (GOPHER_MIN_MEAN_WORD_LEN <= mean_wl <= GOPHER_MAX_MEAN_WORD_LEN):
            out.append(None)
            continue
        if len(_SYM.findall(clean)) / wc1 > GOPHER_MAX_SYMBOL_RATIO:
            out.append(None)
            continue
        lines = clean.split("\n")
        nl1 = float(max(1, len(lines)))
        bullets = sum(ln.lstrip(" ")[:1] in "-*•" for ln in lines)
        if bullets / nl1 > GOPHER_MAX_BULLET_FRAC:
            out.append(None)
            continue
        ell = sum(bool(_ELL.search(ln.rstrip(" "))) for ln in lines)
        if ell / nl1 > GOPHER_MAX_ELLIPSIS_FRAC:
            out.append(None)
            continue
        alpha = sum(any(c.isalpha() for c in w) for w in words)
        if alpha / wc1 < GOPHER_MIN_ALPHA_WORD_FRAC:
            out.append(None)
            continue
        lowered = {w.lower() for w in words}
        if sum(s in lowered for s in _STOPS) < GOPHER_MIN_STOPWORD_HITS:
            out.append(None)
            continue
        # repetition rules (on the ORIGINAL text, matching gopher_filter's
        # composition inside build_pretrain_corpus: gates see c4-cleaned
        # text, so here both line and para sets come from `clean`)
        nz_lines = [ln for ln in clean.split("\n") if ln]
        paras = [p for p in _PARA.split(clean) if p]
        ok = True
        for units, fmax, cmax in (
            (nz_lines, GOPHER_MAX_DUP_LINE_FRAC, GOPHER_MAX_DUP_LINE_CHAR_FRAC),
            (paras, GOPHER_MAX_DUP_PARA_FRAC, GOPHER_MAX_DUP_PARA_CHAR_FRAC),
        ):
            n = len(units)
            distinct = set(units)
            chars = sum(len(u) for u in units)
            chars_d = sum(len(u) for u in distinct)
            if (n - len(distinct)) / max(1, n) > fmax:
                ok = False
                break
            if (chars - chars_d) / max(1, chars) > cmax:
                ok = False
                break
        out.append(clean if ok else None)
    return out


def arrow_gate(df, text_col="text"):
    schema = "doc_id long, source string, text string"

    def run(batches):
        for pdf in batches:
            clean = _gate_pdf(pdf[text_col].tolist())
            keep = pd.Series(clean, index=pdf.index)
            res = pdf.loc[keep.notna(), ["doc_id", "source"]].copy()
            res["text"] = keep[keep.notna()]
            yield res

    return df.mapInPandas(run, schema)


def hof_gate(df, text_col="text"):
    c4 = c4_line_filter(df, text_col)
    gated = c4.withColumn(text_col, F.col("clean_text")).select(
        "doc_id", "source", text_col
    )
    return gopher_filter(gated, text_col)


def timed_sink(df) -> tuple[float, int]:
    sink_root = "/dev/shm" if Path("/dev/shm").is_dir() else None
    out = tempfile.mkdtemp(prefix="qf_gates_ab_", dir=sink_root)
    t0 = time.time()
    df.write.mode("overwrite").parquet(out)
    dt = time.time() - t0
    spark = df.sparkSession
    n = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    return dt, n


def main():
    spark = get_spark("r7_gates_ab")
    if not (CACHE / "_SUCCESS").exists():
        from quality_filter.synth import synth_documents

        synth_documents(spark, N_DOCS, seed=7).write.mode("overwrite").parquet(
            str(CACHE)
        )
    docs = spark.read.parquet(str(CACHE))
    docs.count()  # warm page cache

    res = {"n_docs": N_DOCS}
    for name, fn in [("hof", hof_gate), ("arrow", arrow_gate)]:
        runs = []
        n_out = None
        for _ in range(3):
            dt, n = timed_sink(fn(docs))
            runs.append(round(dt, 3))
            n_out = n
        res[name] = {"runs": runs, "median": sorted(runs)[1], "survivors": n_out}
    assert res["hof"]["survivors"] == res["arrow"]["survivors"], res
    res["speedup_hof_over_arrow"] = round(
        res["hof"]["median"] / res["arrow"]["median"], 3
    )
    print(json.dumps(res))
    Path(__file__).with_name("r7_gates_ab.json").write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
