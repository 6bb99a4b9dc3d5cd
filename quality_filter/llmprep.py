"""A7/A8: LLM-labeling I/O plumbing — output unwrapping + repair-parse,
and numbered-line prompt formatting — as pure Catalyst expressions.

The reference's teacher-labeling loop post-processes vLLM generations with
``out.outputs[0].text.strip(" `\\njson")`` followed by ``json_repair.loads``
(``src/label_lines_with_LLM.py:96-98``) and formats model input as
``"Line {i+1}: {line}\\n------\\n"`` blocks substituted into a prompt
template (``src/label_lines_with_LLM.py:111-117``, template in
``src/prompts.py:129``).  The LLM call itself is out of scope (M2,
declared in SURVEY §2.8); these are the deterministic data transforms
around it, needed by anyone re-running labeling over a transcript table.

Scale note: both are narrow per-row projections.  The prompt formatter
takes an already-collected line array (one conversation per row); build it
with ``pipeline.reassemble``-style grouping, never a window.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Python str.strip(" `\njson") removes ANY of these chars from both ends.
_WRAP_CLASS = "[ `\\njson]"
_WRAP_STRIP_RE = f"^{_WRAP_CLASS}+|{_WRAP_CLASS}+$"


def strip_llm_wrapper(col: Column) -> Column:
    """A7 step 1: strip code fences / 'json' tags / whitespace from both
    ends — exact ``str.strip(" `\\njson")`` semantics (char-set strip, not
    substring removal)."""
    return F.regexp_replace(col, _WRAP_STRIP_RE, "")


def repair_json(col: Column) -> Column:
    """A7 step 2 (lightweight json_repair analog): drop trailing commas
    before closing brackets and promote single-quoted keys/values to
    double quotes when the payload uses no double quotes at all.  Quote
    promotion only touches quotes ADJACENT to structural characters
    (``{ [ , :`` before, ``} ] , :`` after), so embedded apostrophes like
    ``{'note': 'it's fine'}`` survive as content — matching json_repair
    more closely than a blanket replace.  Returns the repaired STRING;
    pair with ``from_json`` (PERMISSIVE: unparseable rows yield NULL
    struct, the relational twin of json_repair's best-effort contract)."""
    no_trailing = F.regexp_replace(col, r",\s*([}\]])", "$1")
    opened = F.regexp_replace(no_trailing, r"([{\[,:]\s*)'", '$1"')
    closed = F.regexp_replace(opened, r"'(\s*[}\],:])", '"$1')
    return F.when(no_trailing.contains('"'), no_trailing).otherwise(closed)


def parse_llm_output(col: Column, schema: StructType | str) -> Column:
    """Full A7 chain: strip wrapper → repair → from_json(schema)."""
    return F.from_json(repair_json(strip_llm_wrapper(col)), schema)


def parse_llm_output_py(raw: str):
    """Driver-side Python twin of the A7 chain, for the model-sized
    payloads that never touch a DataFrame (e.g. the synonym-review
    responses in taxonomy.review_synonym_groups): strip(" `\\njson") →
    trailing-comma removal → quote promotion when the payload has no
    double quotes → ``json.loads``.  Returns None when the payload stays
    unparseable (the relational twin's PERMISSIVE NULL row)."""
    import json
    import re

    s = (raw or "").strip(" `\njson")
    s = re.sub(r",\s*([}\]])", r"\1", s)
    if '"' not in s:
        s = re.sub(r"([{\[,:]\s*)'", r'\1"', s)
        s = re.sub(r"'(\s*[}\],:])", r'"\1', s)
    try:
        return json.loads(s)
    except ValueError:
        return None


def formatted_lines_expr(lines: Column) -> Column:
    """A8: ``"Line {i+1}: {line}\\n------\\n"`` blocks over a line array
    (``src/label_lines_with_LLM.py:111-114``)."""
    return F.array_join(
        F.transform(
            lines,
            lambda line, i: F.concat(
                F.lit("Line "),
                (i + 1).cast("string"),
                F.lit(": "),
                line,
                F.lit("\n------\n"),
            ),
        ),
        "",
    )


# Condensed classify-prompt skeleton (full text: src/prompts.py:129-186);
# the engine treats the template as data — swap in the verbatim one for
# production labeling runs.
CLASSIFY_TEMPLATE = (
    "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n"
    "You are an expert text classifier specializing in LLM training data. "
    "You will be given a passage from a document in %s and your task is to "
    "classify each line of text.\n"
    "<|eot_id|><|start_header_id|>user<|end_header_id|>\n%s"
    "<|eot_id|><|start_header_id|>assistant<|end_header_id|>"
)


def classify_prompt_expr(lines: Column, language: Column) -> Column:
    """A8: substitute language + formatted lines into the classify
    template (``src/prompts.py:129``, ``format_input`` at
    ``src/label_lines_with_LLM.py:102-121``)."""
    return F.format_string(
        CLASSIFY_TEMPLATE, language, formatted_lines_expr(lines)
    )


# -- verbatim templates (data) ----------------------------------------------
# The reference's full prompt texts, shipped AS DATA under data/prompts/
# (one .txt per template, placeholders __LANGUAGE__/__LINES__/__VOCAB__/
# __GROUP_NAME__/__SYNONYMS__) so a production labeling replay is
# byte-compatible with src/prompts.py:1-217.  tests/test_reseg_langmap.py
# asserts byte parity against the reference functions.

def load_verbatim_template(name: str) -> str:
    """Read a verbatim template ('classify', 'generate_labels',
    'synonyms') from the packaged data files.  Uses importlib.resources,
    NOT ``Path(__file__)`` — the latter breaks when the package is
    imported from a ``--py-files`` zip (zipimport has no real paths)."""
    from importlib import resources

    return (
        resources.files("quality_filter") / "data" / "prompts" / f"{name}.txt"
    ).read_text()


def template_expr(template: str, subs: dict[str, Column]) -> Column:
    """Build a Catalyst expression that renders ``template`` with each
    placeholder token replaced by its Column: the template is split on the
    tokens driver-side and reassembled as one ``concat`` of literals and
    columns — no regex or UDF at runtime, and JSON braces in the template
    need no escaping."""
    import re

    pattern = "(" + "|".join(map(re.escape, subs)) + ")"
    parts = [p for p in re.split(pattern, template) if p != ""]
    return F.concat(*[subs[p] if p in subs else F.lit(p) for p in parts])


def classify_prompt_verbatim_expr(lines: Column, language: Column) -> Column:
    """Byte-compatible replay of ``src/prompts.py:129`` classify(): the
    verbatim template with the formatted line blocks and language
    substituted."""
    return template_expr(
        load_verbatim_template("classify"),
        {"__LANGUAGE__": language, "__LINES__": formatted_lines_expr(lines)},
    )


def generate_labels_prompt_verbatim_expr(
    lines: Column, vocab: Column, language: Column
) -> Column:
    """Byte-compatible replay of ``src/prompts.py:1`` generate_labels()."""
    return template_expr(
        load_verbatim_template("generate_labels"),
        {
            "__LANGUAGE__": language,
            "__LINES__": formatted_lines_expr(lines),
            "__VOCAB__": vocab,
        },
    )


def synonyms_prompt_verbatim_expr(group_name: Column, synonyms: Column) -> Column:
    """Byte-compatible replay of ``src/prompts.py:92`` synonyms()."""
    return template_expr(
        load_verbatim_template("synonyms"),
        {"__GROUP_NAME__": group_name, "__SYNONYMS__": synonyms},
    )
