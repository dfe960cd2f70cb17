"""DuckDB oracle SQL generation for the driver's correctness gate.

The flagship exception pipeline is not natively SQL — but it *is* expressible
as a recursive CTE: the FSM transition is a pure function of (state, line),
so `WITH RECURSIVE scan` steps conv-by-conv through turn_idx, reproducing the
double-transition semantics (exception_detector.rb:206-225) with CASE chains
generated straight from the rule catalog.  Statuses → start-of-block flags →
running-sum segment ids → ordered string_agg then mirror the Spark plan
1:1, so the driver can hash-compare both engines' results.

The synthetic transcripts themselves are derived from literals + range(),
identically in Spark (sources/transcripts.py) and here — no external data.
"""

from __future__ import annotations

from ..rules import START_STATE, STATES, CompiledRules, compile_rules, to_re2
from ..sources.transcripts import BASE_EPOCH, N_SCENARIOS, scenario_lines


def q(s: str) -> str:
    """SQL single-quoted literal (DuckDB standard strings: '' escapes ')."""
    return "'" + s.replace("'", "''") + "'"


def _first_match_case(rules: CompiledRules, state_expr: str, text: str) -> str:
    """CASE over the current state returning the first matching rule's
    to_state, or NULL if no rule of that state matches."""
    whens = []
    for sid, targets in enumerate(rules.by_state):
        if not targets:
            continue
        inner = " ".join(
            f"WHEN regexp_matches({text}, {q(to_re2(rules.patterns[pid]))}) THEN {q(STATES[tid])}"
            for pid, tid in targets
        )
        whens.append(f"WHEN {q(STATES[sid])} THEN (CASE {inner} ELSE NULL END)")
    return f"(CASE {state_expr} " + " ".join(whens) + " ELSE NULL END)"


def _start_match_case(rules: CompiledRules, text: str) -> str:
    """First matching start_state rule's to_state, else 'start_state'
    (the retry path of exception_detector.rb:208-211)."""
    inner = " ".join(
        f"WHEN regexp_matches({text}, {q(to_re2(rules.patterns[pid]))}) THEN {q(STATES[tid])}"
        for pid, tid in rules.by_state[0]
    )
    return f"(CASE {inner} ELSE {q(START_STATE)} END)"


def transcripts_cte(n_convs: int, repeats: int = 1, ts_extra: str = "0",
                    text_expr: str = "l.text") -> str:
    """CTE block `lines`, `t` — byte-identical to synth_transcripts().
    ``ts_extra`` is a SQL expression over ``l.turn_idx`` added to the
    timestamp (used to synthesize deterministic event-time gaps);
    ``text_expr`` transforms the message text (e.g. trailing-newline strip
    for the force_line_breaks gate query)."""
    rows = scenario_lines(repeats)
    values = ",\n    ".join(f"({scn}, {turn}, {q(text)})" for scn, turn, text in rows)
    return f"""
lines(scn, turn_idx, text) AS (
  SELECT * FROM (VALUES
    {values}
  ) v(scn, turn_idx, text)
),
t AS (
  SELECT 'conv.' || lpad(CAST(c.c AS VARCHAR), 6, '0') AS conv_id,
         l.turn_idx,
         CASE WHEN l.turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         ({text_expr}) AS text,
         'tool' || CAST(l.turn_idx % 3 AS VARCHAR) AS tool,
         CAST({BASE_EPOCH} + l.turn_idx + ({ts_extra}) AS BIGINT) AS ts
  FROM (SELECT range AS c FROM range({n_convs})) c
  JOIN lines l ON l.scn = c.c % {N_SCENARIOS}
)"""


LANG_CASE = (
    "CASE WHEN first_state LIKE 'java%' THEN 'java' "
    "WHEN first_state LIKE 'python%' THEN 'python' "
    "WHEN first_state LIKE 'php%' THEN 'php' "
    "WHEN first_state LIKE 'go%' THEN 'go' "
    "WHEN first_state LIKE 'ruby%' THEN 'ruby' "
    "WHEN first_state LIKE 'dart%' THEN 'dart' END"
)


def _final_select(remove_tag_prefix: str | None) -> str:
    import re as _re

    out_tag = (
        f"regexp_replace(conv_id, {q('^' + _re.escape(remove_tag_prefix) + chr(92) + '.')}, '')"
        if remove_tag_prefix
        else "conv_id"
    )
    return f"""
SELECT conv_id, first_turn_idx, role, tool, ts, text, n_lines,
       {LANG_CASE} AS lang,
       CASE WHEN {LANG_CASE} IS NOT NULL THEN 'lang_' || {LANG_CASE} ELSE 'passthrough' END AS sink,
       {out_tag} AS out_tag
FROM grouped"""


def pipeline_sql(n_convs: int, repeats: int = 1, languages=("all",),
                 remove_tag_prefix: str | None = "conv",
                 final_select: str | None = None,
                 gap_interval: float | None = None,
                 ts_extra: str = "0",
                 max_lines: int = 0,
                 max_bytes: int = 0,
                 force_line_breaks: bool = False,
                 text_expr: str = "l.text") -> str:
    """Full oracle for the exception pipeline.  ``gap_interval`` enables the
    O13 event-time flush: a gap > interval forces flush+reset *before* the
    row — the recursive step then transitions from start_state and the row
    raises a start-of-block flag.

    With ``max_lines``/``max_bytes``/``force_line_breaks`` the recursion also
    carries the buffer's (line count, char size): the max_bytes pre-check
    force-flushes *before* the FSM update and the max_lines post-check
    *after* it, both with an FSM reset (exception_detector.rb:284-291); the
    reset lands before the next row exactly like the Spark repair loop
    (operators/fsm.py).  force_line_breaks prepends a newline to non-first
    buffered lines lacking one (exception_detector.rb:366-371) — both in the
    concat member expression and in the byte accounting."""
    rules = compile_rules(languages)
    general = max_lines > 0 or max_bytes > 0 or force_line_breaks
    final = final_select or _final_select(remove_tag_prefix)
    gap_expr = "FALSE" if gap_interval is None else f"(t2.ts - s.ts) > {gap_interval}"
    start_rec = _start_match_case(rules, "t2.text")
    s1_base = _start_match_case(rules, "text")
    first_base = _first_match_case(rules, q(START_STATE), "text")
    cte = transcripts_cte(n_convs, repeats, ts_extra, text_expr)

    if not general:
        eff_state = (
            "s.state"
            if gap_interval is None
            else f"(CASE WHEN {gap_expr} THEN {q(START_STATE)} ELSE s.state END)"
        )
        s1_rec = _first_match_case(rules, eff_state, "t2.text")
        return f"""WITH RECURSIVE
{cte},
scan AS (
  SELECT conv_id, turn_idx, role, tool, ts, text,
         ({first_base}) IS NOT NULL AS matched,
         COALESCE({first_base}, {s1_base}) AS state,
         FALSE AS gap
  FROM t WHERE turn_idx = 0
  UNION ALL
  SELECT t2.conv_id, t2.turn_idx, t2.role, t2.tool, t2.ts, t2.text,
         ({s1_rec}) IS NOT NULL AS matched,
         COALESCE({s1_rec}, {start_rec}) AS state,
         {gap_expr} AS gap
  FROM scan s JOIN t t2
    ON t2.conv_id = s.conv_id AND t2.turn_idx = s.turn_idx + 1
),
statuses AS (
  SELECT *,
    CASE WHEN matched AND state <> 'start_state' THEN 'inside'
         WHEN matched THEN 'end'
         WHEN state <> 'start_state' THEN 'start'
         ELSE 'no' END AS status
  FROM scan
),
flags AS (
  SELECT *,
    CASE WHEN gap OR status IN ('no', 'start')
           OR COALESCE(lag(status) OVER w, 'no') IN ('no', 'end')
         THEN 1 ELSE 0 END AS flag
  FROM statuses
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
segs AS (
  SELECT *, sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS seg
  FROM flags
),
grouped AS (
  SELECT conv_id,
         CAST(min(turn_idx) AS BIGINT) AS first_turn_idx,
         arg_min(role, turn_idx) AS role,
         arg_min(tool, turn_idx) AS tool,
         arg_min(ts, turn_idx) AS ts,
         string_agg(text, '' ORDER BY turn_idx) AS text,
         CAST(count(*) AS BIGINT) AS n_lines,
         arg_min(state, turn_idx) AS first_state
  FROM segs
  GROUP BY conv_id, seg
)
{final}"""

    # --- general form: buffer counters carried through the recursion -------
    # NB: every intermediate alias is __-prefixed — DuckDB binds a bare name
    # to a real column of the recursive table `scan` BEFORE a same-SELECT
    # lateral alias, so aliases must never collide with scan's schema (or
    # they silently read the previous row's value).
    flb = "TRUE" if force_line_breaks else "FALSE"
    fm_rec = _first_match_case(rules, "__eff", "t2.text")
    preforce = (
        f"(NOT __gap AND s.cnt > 0 AND s.nbytes + length(t2.text) > {max_bytes})"
        if max_bytes > 0
        else "FALSE"
    )
    postforce = f"(__cnt1 = {max_lines})" if max_lines > 0 else "FALSE"
    # shared tail of both members: status -> byte/line accounting -> limits.
    # DuckDB lateral column aliases let each value build on the previous one.
    acct = f"""
         CASE WHEN __fm IS NOT NULL AND __state <> 'start_state' THEN 'inside'
              WHEN __fm IS NOT NULL THEN 'end'
              WHEN __state <> 'start_state' THEN 'start'
              ELSE 'no' END AS __status,
         CAST(length(__text) + CASE WHEN {flb} AND __pcnt > 0
                                   AND NOT contains(__text, chr(10))
                              THEN 1 ELSE 0 END AS BIGINT) AS __addlen,
         CAST(CASE WHEN __status = 'inside' THEN __pcnt + 1
                   WHEN __status = 'start' THEN 1 ELSE 0 END AS BIGINT) AS __cnt1,
         CAST(CASE WHEN __status = 'inside' THEN __pnb + __addlen
                   WHEN __status = 'start' THEN __addlen ELSE 0 END AS BIGINT) AS __nb1,
         ({postforce}) AS __post"""
    emit = f"""{acct},
         __gap AS gap, __pre AS preforce, __fm AS fm_state, __state AS state,
         __status AS status, __post AS postforce,
         CASE WHEN __post THEN 0 ELSE __cnt1 END AS cnt,
         CASE WHEN __post THEN 0 ELSE __nb1 END AS nbytes"""
    return f"""WITH RECURSIVE
{cte},
scan AS (
  SELECT conv_id, turn_idx, role, tool, ts, __text AS text,{emit}
  FROM (
    SELECT conv_id, turn_idx, role, tool, ts, text AS __text,
           FALSE AS __gap, FALSE AS __pre,
           CAST(0 AS BIGINT) AS __pcnt, CAST(0 AS BIGINT) AS __pnb,
           ({first_base}) AS __fm,
           COALESCE(__fm, {s1_base}) AS __state
    FROM t WHERE turn_idx = 0
  ) b
  UNION ALL
  SELECT conv_id, turn_idx, role, tool, ts, __text AS text,{emit}
  FROM (
    SELECT t2.conv_id AS conv_id, t2.turn_idx AS turn_idx, t2.role AS role,
           t2.tool AS tool, t2.ts AS ts, t2.text AS __text,
           ({gap_expr}) AS __gap,
           ({preforce}) AS __pre,
           CASE WHEN __gap OR __pre THEN 0 ELSE s.cnt END AS __pcnt,
           CASE WHEN __gap OR __pre THEN 0 ELSE s.nbytes END AS __pnb,
           CASE WHEN __gap OR __pre OR s.postforce
                THEN {q(START_STATE)} ELSE s.state END AS __eff,
           ({fm_rec}) AS __fm,
           COALESCE(__fm, {start_rec}) AS __state
    FROM scan s JOIN t t2
      ON t2.conv_id = s.conv_id AND t2.turn_idx = s.turn_idx + 1
  ) r
),
flags AS (
  SELECT *,
    CASE WHEN gap OR preforce OR status IN ('no', 'start')
           OR COALESCE(lag(status) OVER w, 'no') IN ('no', 'end')
           OR COALESCE(lag(postforce) OVER w, FALSE)
         THEN 1 ELSE 0 END AS flag
  FROM scan
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
segs AS (
  SELECT *, sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS seg
  FROM flags
),
members AS (
  SELECT *, CASE WHEN {flb} AND turn_idx > min(turn_idx) OVER sw
                  AND NOT contains(text, chr(10))
             THEN chr(10) || text ELSE text END AS member
  FROM segs
  WINDOW sw AS (PARTITION BY conv_id, seg)
),
grouped AS (
  SELECT conv_id,
         CAST(min(turn_idx) AS BIGINT) AS first_turn_idx,
         arg_min(role, turn_idx) AS role,
         arg_min(tool, turn_idx) AS tool,
         arg_min(ts, turn_idx) AS ts,
         string_agg(member, '' ORDER BY turn_idx) AS text,
         CAST(count(*) AS BIGINT) AS n_lines,
         arg_min(state, turn_idx) AS first_state
  FROM members
  GROUP BY conv_id, seg
)
{final}"""


def sink_counts_sql(n_convs: int, repeats: int = 1) -> str:
    return pipeline_sql(
        n_convs,
        repeats,
        final_select=f"""
SELECT CASE WHEN {LANG_CASE} IS NOT NULL THEN 'lang_' || {LANG_CASE} ELSE 'passthrough' END AS sink,
       CAST(count(*) AS BIGINT) AS n
FROM grouped GROUP BY 1""",
    )


def classify_start_sql(n_convs: int, repeats: int = 1) -> str:
    """Per-line start-rule classification (O5 standalone): which language
    family's start rule fires first in :all order."""
    rules = compile_rules(("all",))
    whens = []
    for pid, tid in rules.by_state[0]:
        fam = STATES[tid].split("_")[0]
        fam = {"java": "java", "python": "python", "php": "php", "go": "go",
               "ruby": "ruby", "dart": "dart"}[fam]
        whens.append(
            f"WHEN regexp_matches(text, {q(to_re2(rules.patterns[pid]))}) THEN {q(fam)}"
        )
    case = "CASE " + " ".join(whens) + " ELSE NULL END"
    return f"""WITH
{transcripts_cte(n_convs, repeats)}
SELECT conv_id, turn_idx, {case} AS start_lang FROM t"""


def demux_counts_sql(n_convs: int, repeats: int = 1) -> str:
    return f"""WITH
{transcripts_cte(n_convs, repeats)}
SELECT conv_id, tool, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(min(turn_idx) AS BIGINT) AS first_turn,
       CAST(max(turn_idx) AS BIGINT) AS last_turn
FROM t GROUP BY conv_id, tool"""


def tag_rewrite_sql(n_convs: int) -> str:
    """O14 semantics matrix: strip only a complete leading part + dot."""
    return f"""WITH
{transcripts_cte(n_convs, 1)},
tags AS (SELECT DISTINCT 'prefix.plus.' || conv_id AS tag FROM t)
SELECT tag,
       regexp_replace(tag, '^prefix\\.plus\\.', '') AS strip_full,
       regexp_replace(tag, '^prefix\\.pl\\.', '') AS strip_partial,
       regexp_replace(tag, '^does\\.not\\.occur\\.', '') AS strip_missing
FROM tags"""


# ---------------------------------------------------------------------------
# Training-data pipeline oracles (documents / embeddings testdata tables)
# ---------------------------------------------------------------------------

_MARKER_SQL = {
    "en": r"\b(?:the|and|of|is)\b",
    "fr": r"\b(?:le|la|et|les)\b",
    "de": r"\b(?:der|und|die|nicht)\b",
    "es": r"\b(?:el|que|los|una)\b",
}


def _cnt(lang: str) -> str:
    return f"len(regexp_extract_all(lower(text), {q(_MARKER_SQL[lang])}))"


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keep_id
FROM documents GROUP BY 1"""

TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, ' ?[\p{L}]+| ?[\p{N}]+| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
FROM documents"""

QUALITY_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(lower(text), '\b(?:the|and|of|is)\b')) AS BIGINT) AS n_stopwords,
       CAST(floor(10.0 * length(text) /
                  greatest(len(regexp_extract_all(text, '\S+')), 1)) AS BIGINT) AS tok_len_deci
FROM documents"""


def lang_case_sql() -> str:
    """The marker-count language-ID cascade as a bare CASE expression over a
    ``text`` column (mirrors functions.text.lang_id)."""
    conds = []
    langs = list(_MARKER_SQL)
    for i, lang in enumerate(langs):
        c = [f"{_cnt(lang)} > 0"]
        for later in langs[i + 1 :]:
            c.append(f"{_cnt(lang)} >= {_cnt(later)}")
        conds.append(f"WHEN {' AND '.join(c)} THEN {q(lang)}")
    return f"CASE {' '.join(conds)} ELSE 'und' END"


def lang_id_doc_sql() -> str:
    return f"""
SELECT doc_id, lang AS actual_lang,
       {lang_case_sql()} AS pred_lang
FROM documents"""


FINGERPRINT_SQL = r"""
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
FROM documents"""


def _shingle_sql(k: int) -> str:
    base = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    return (
        f"CASE WHEN length({base}) >= {k} THEN "
        f"list_distinct(list_transform(range(0, length({base}) - {k} + 1), "
        f"i -> substr({base}, i + 1, {k}))) "
        f"ELSE [{base}] END"
    )


def _hash64_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def winnow_fingerprints_sql(k: int = 7, w: int = 5, where: str = "") -> str:
    """Mirror of functions.text.winnow_fingerprints: positional k-gram
    rolling hashes → distinct sliding-window minima, exploded to
    (doc_id, fp) rows.  ``where`` restricts the source rows (bipartite
    forms like decontamination)."""
    base = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    h = _hash64_sql(f"substr(base, i + 1, {k})")
    return f"""
WITH b AS (SELECT doc_id, {base} AS base FROM documents {where}),
g AS (
  SELECT doc_id,
         CASE WHEN length(base) >= {k}
              THEN list_transform(range(0, length(base) - {k} + 1), i -> {h})
              ELSE [{_hash64_sql('base')}] END AS grams
  FROM b
),
wmin AS (
  SELECT doc_id,
         CASE WHEN len(grams) >= {w}
              THEN list_distinct(list_transform(
                     range(0, len(grams) - {w} + 1),
                     j -> list_min(list_slice(grams, j + 1, j + {w}))))
              ELSE [list_min(grams)] END AS fps
  FROM g
)
SELECT doc_id, unnest(fps) AS fp FROM wmin"""


def winnow_dup_pairs_sql(k: int = 7, w: int = 5, min_shared: int = 3,
                         max_bucket: int = 0) -> str:
    """Mirror of operators.dedup.winnow_dup_pairs: count distinct shared
    winnowing fingerprints per id pair; ``max_bucket`` > 0 mirrors the
    opt-in degenerate-fp cap (fps shared by more docs are dropped before
    the self-join)."""
    fps = winnow_fingerprints_sql(k, w)
    cap = ""
    if max_bucket:
        cap = f""",
fps AS (
  SELECT f.* FROM fps0 f
  JOIN (SELECT fp FROM fps0 GROUP BY fp HAVING count(*) <= {max_bucket}) s
    USING (fp)
)"""
    first = "fps0" if max_bucket else "fps"
    return f"""
WITH {first} AS ({fps}){cap}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}"""


def oversized_winnow_buckets_sql(k: int = 7, w: int = 5,
                                 max_bucket: int = 256) -> str:
    """Mirror of operators.dedup.oversized_winnow_buckets: fingerprints
    shared by more than ``max_bucket`` docs (the buckets a capped
    winnow_dup_pairs skips)."""
    return f"""
WITH fps AS ({winnow_fingerprints_sql(k, w)})
SELECT fp, CAST(count(*) AS BIGINT) AS n_docs
FROM fps GROUP BY fp HAVING count(*) > {max_bucket}"""


def winnow_rep_pairs_sql(k: int = 7, w: int = 5, min_shared: int = 3,
                         max_bucket: int = 256) -> str:
    """Mirror of operators.dedup.winnow_rep_pairs: min-id representative vs
    member inside oversized fp buckets, verified by the FULL shared-fp
    count."""
    return f"""
WITH fps AS ({winnow_fingerprints_sql(k, w)}),
szd AS (
  SELECT doc_id, fp,
         count(*) OVER (PARTITION BY fp) AS n,
         min(doc_id) OVER (PARTITION BY fp) AS rep
  FROM fps
),
cand AS (
  SELECT DISTINCT rep AS id_a, doc_id AS id_b FROM szd
  WHERE n > {max_bucket} AND doc_id <> rep
)
SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM cand c
JOIN fps a ON a.doc_id = c.id_a
JOIN fps b ON b.doc_id = c.id_b AND b.fp = a.fp
GROUP BY 1, 2 HAVING count(*) >= {min_shared}"""


def decontaminate_sql(split_id: int = 450, k: int = 7, w: int = 5,
                      min_shared: int = 3) -> str:
    """Mirror of operators.dedup.decontaminate with train = doc_id <
    split_id and eval = the rest: training docs sharing ≥ min_shared
    winnowing fingerprints with the eval corpus are dropped."""
    train = winnow_fingerprints_sql(k, w, where=f"WHERE doc_id < {split_id}")
    ev = winnow_fingerprints_sql(k, w, where=f"WHERE doc_id >= {split_id}")
    return f"""
WITH tf AS ({train}),
ef AS (SELECT DISTINCT fp FROM ({ev})),
bad AS (
  SELECT tf.doc_id FROM tf JOIN ef USING (fp)
  GROUP BY tf.doc_id HAVING count(*) >= {min_shared}
)
SELECT doc_id FROM documents
WHERE doc_id < {split_id} AND doc_id NOT IN (SELECT doc_id FROM bad)"""


def stratified_sample_sql(rates_millis: dict, default_millis: int = 1000,
                          salt: str = "sample") -> str:
    """Mirror of operators.sample.stratified_sample: deterministic
    md5-bucket per doc vs a per-source rate CASE."""
    bucket = _hash64_sql(f"'{salt}:' || CAST(doc_id AS VARCHAR)") + " % 1000"
    cases = " ".join(
        f"WHEN '{v}' THEN {m}" for v, m in sorted(rates_millis.items())
    )
    return f"""
SELECT doc_id, source FROM documents
WHERE {bucket} < CASE source {cases} ELSE {default_millis} END"""


def repetition_stats_sql() -> str:
    """Mirror of functions.text.repetition_stats_df: per-doc word counts,
    distinct words, 2-gram count and top-2-gram occurrence count."""
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    return f"""
WITH w AS (SELECT doc_id, string_split({norm}, ' ') AS words FROM documents),
base AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
         CAST(greatest(len(words) - 1, 0) AS BIGINT) AS n_2grams
  FROM w
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1])) AS g
  FROM w
),
top AS (
  SELECT doc_id, CAST(max(n) AS BIGINT) AS top_2gram_n
  FROM (SELECT doc_id, g, count(*) AS n FROM grams GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT b.doc_id, b.n_words, b.n_distinct_words, b.n_2grams,
       CAST(coalesce(t.top_2gram_n, 0) AS BIGINT) AS top_2gram_n
FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id"""


def prepare_training_data_sql(
    threshold_millis: int = 500, max_bucket: int = 16,
    rates_millis: dict | None = None, default_millis: int = 1000,
    min_chars: int = 100, min_tokens: int = 20,
    punct_ratio_x: int = 5, top2gram_ratio_x: int = 4,
    salt: str = "sample",
) -> str:
    """Mirror of plans.training_data.prepare_training_data (without the
    eval corpus — decontamination is gated standalone): intersection of
    the exact-dedup, CC near-dedup, quality, repetition and sampling
    gates.  Quality expressions copy the training_data_filter oracle
    fragments verbatim so the two cannot drift."""
    toks = r"len(regexp_extract_all(d.text, '\S+'))"
    punct = r"len(regexp_extract_all(d.text, '[.,!?;:]'))"
    sample_pred = ""
    if rates_millis is not None or default_millis != 1000:
        bucket = _hash64_sql(f"'{salt}:' || CAST(d.doc_id AS VARCHAR)") + " % 1000"
        cases = " ".join(
            f"WHEN '{v}' THEN {m}" for v, m in sorted((rates_millis or {}).items())
        )
        case = f"CASE d.source {cases} ELSE {default_millis} END" if cases else str(
            default_millis
        )
        sample_pred = f"\n  AND {bucket} < {case}"
    return f"""
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
  AND d.doc_id IN ({near_dedup_full_sql(threshold_millis, max_bucket)})
  AND CAST(length(d.text) AS BIGINT) >= {min_chars}
  AND {toks} >= {min_tokens}
  AND {punct} * {punct_ratio_x} <= {toks}
  AND d.doc_id IN (
    SELECT doc_id FROM ({repetition_stats_sql()})
    WHERE top_2gram_n * {top2gram_ratio_x} <= greatest(n_2grams, 1)
  ){sample_pred}"""


def near_dedup_cc_sql(n_docs: int = 40, piece_len: int = 240,
                      stride: int = 120, n_pieces: int = 3,
                      min_len: int = 40, shingle_k: int = 5,
                      threshold_millis: int = 250) -> str:
    """Mirror of the near_dedup_cc gate query: overlapping substring pieces
    of the first ``n_docs`` documents form deterministic a-b-c similarity
    CHAINS (adjacent pieces overlap, distant ones don't); pairs are exact
    all-pairs hashed-shingle Jaccard over the pieces; components are the
    TRANSITIVE CLOSURE, computed here with a recursive reachability CTE and
    in Spark with the Hash-Min + pointer-jumping loop
    (operators.dedup.connected_components)."""
    piece = f"substr(base, 1 + {stride} * j, {piece_len})"
    vals = ", ".join(f"({j})" for j in range(n_pieces))
    return f"""
WITH RECURSIVE
b AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS base
  FROM documents WHERE doc_id < {n_docs}
),
pieces AS (
  SELECT doc_id * {n_pieces} + j AS pid, {piece} AS text
  FROM b CROSS JOIN (VALUES {vals}) t(j)
  WHERE length({piece}) >= {min_len}
),
hsh AS (
  SELECT pid,
         list_distinct(list_transform({_shingle_sql(shingle_k)},
                                      s -> {_hash64_sql('s')})) AS hs
  FROM pieces
),
cand AS (
  SELECT a.pid AS id_a, b.pid AS id_b,
         len(list_intersect(a.hs, b.hs)) AS inter,
         len(a.hs) AS na, len(b.hs) AS nb
  FROM hsh a JOIN hsh b ON a.pid < b.pid
),
pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE CAST(floor(1000.0 * inter / (na + nb - inter)) AS BIGINT)
        >= {threshold_millis}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u"""


def near_dedup_full_sql(threshold_millis: int = 500, max_bucket: int = 16,
                        num_hashes: int = 8, band_size: int = 2,
                        k: int = 5) -> str:
    """Mirror of the near_dedup_full gate query: capped in-bucket Jaccard
    pairs UNION rep-pairs recovery of the oversized buckets, connected
    components over the union (recursive reachability), keep one doc (the
    component min) per component plus every untouched doc."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b FROM ({jaccard_pairs_sql(threshold_millis, num_hashes,
                                             band_size, k, max_bucket)})
  UNION
  SELECT id_a, id_b FROM ({jaccard_rep_pairs_sql(threshold_millis, num_hashes,
                                                 band_size, k, max_bucket)})
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u, least(u, min(v)) AS c FROM reach GROUP BY u)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT u FROM comp WHERE u <> c)"""


def _bands_cte(num_hashes: int, band_size: int, k: int) -> str:
    """Shared WITH-prefix (sh → sigs → bands) for every minhash-band mirror:
    one construction so the banding scheme cannot drift between the
    minhash_bands and oversized_buckets oracles (code-review r3)."""
    sigs = [
        f"list_min(list_transform(sh, s -> {_hash64_sql(q(str(j) + ':') + ' || s')})) AS s{j}"
        for j in range(num_hashes)
    ]
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        key_parts = " || ',' || ".join(
            f"CAST(s{b * band_size + i} AS VARCHAR)" for i in range(band_size)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({key_parts}) AS band_key FROM sigs"
        )
    union = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH sh AS (SELECT doc_id, {_shingle_sql(k)} AS sh FROM documents),
sigs AS (SELECT doc_id, {', '.join(sigs)} FROM sh),
bands AS ({union})"""


def minhash_bands_sql(num_hashes: int = 8, band_size: int = 2, k: int = 5) -> str:
    return f"""{_bands_cte(num_hashes, band_size, k)}
SELECT band_id, band_key,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM bands GROUP BY band_id, band_key HAVING count(*) > 1"""


def oversized_buckets_sql(max_bucket: int = 256, num_hashes: int = 8,
                          band_size: int = 2, k: int = 5) -> str:
    """Mirror of operators.dedup.oversized_lsh_buckets: LSH band buckets
    holding more than ``max_bucket`` docs — the groups a capped
    jaccard_pairs skips (recall-loss visibility, ADVICE r2)."""
    return f"""{_bands_cte(num_hashes, band_size, k)}
SELECT band_id, band_key, CAST(count(*) AS BIGINT) AS n_docs
FROM bands GROUP BY band_id, band_key HAVING count(*) > {max_bucket}"""


def jaccard_rep_pairs_sql(threshold_millis: int = 500, num_hashes: int = 8,
                          band_size: int = 2, k: int = 5,
                          max_bucket: int = 256) -> str:
    """Mirror of operators.dedup.jaccard_rep_pairs: min-id representative vs
    member inside oversized buckets, exact hashed-shingle Jaccard."""
    jac = "CAST(floor(1000.0 * inter / (na + nb - inter)) AS BIGINT)"
    return f"""{_bands_cte(num_hashes, band_size, k)},
szd AS (
  SELECT doc_id, band_id, band_key,
         count(*) OVER (PARTITION BY band_id, band_key) AS n,
         min(doc_id) OVER (PARTITION BY band_id, band_key) AS rep
  FROM bands
),
cand AS (
  SELECT DISTINCT rep AS id_a, doc_id AS id_b FROM szd
  WHERE n > {max_bucket} AND doc_id <> rep
),
hsh AS (SELECT doc_id,
               list_distinct(list_transform({_shingle_sql(k)},
                                            s -> {_hash64_sql('s')})) AS hs
        FROM documents),
j AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.hs, sb.hs)) AS inter,
         len(sa.hs) AS na, len(sb.hs) AS nb
  FROM cand c
  JOIN hsh sa ON sa.doc_id = c.id_a
  JOIN hsh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, {jac} AS jaccard_millis
FROM j WHERE {jac} >= {threshold_millis}"""


def simhash_buckets_sql(prefix_bits: int = 8) -> str:
    """Bit-identical mirror of operators.dedup.simhash_signatures_df /
    simhash_near_dups: 60-bit SimHash by per-bit ±1 vote over whitespace
    token occurrences of the normalized text, token-hashed with the portable
    md5 scheme; bucket = low ``prefix_bits``; emit buckets holding >1 doc."""
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    hs = f"list_transform({toks}, t -> {_hash64_sql('t')})"
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN ((h >> {b}) & 1) = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(60)
    )
    return f"""
WITH toks AS (SELECT doc_id, {hs} AS hs FROM documents),
sims AS (SELECT doc_id, ({bit_terms}) AS simhash FROM toks),
buckets AS (SELECT doc_id, simhash & {(1 << prefix_bits) - 1} AS bucket FROM sims)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_id
FROM buckets GROUP BY bucket HAVING count(*) > 1"""


def embedding_topk_sql(k: int = 10) -> str:
    dq = "list_transform((SELECT embedding FROM embeddings WHERE vec_id = 0), x -> CAST(x AS DOUBLE))"
    return f"""
WITH q AS (SELECT {dq} AS qv),
s AS (
  SELECT vec_id,
         list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
           / sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(embedding, x -> CAST(x AS DOUBLE))))
           / sqrt(list_dot_product(qv, qv)) AS sim
  FROM embeddings, q
)
SELECT vec_id, CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
FROM s ORDER BY sim_micro DESC, vec_id LIMIT {k}"""


def ann_lsh_topk_sql(dim: int = 64, n_planes: int = 8, k: int = 10) -> str:
    """Mirror of operators.similarity.lsh_bucketed_topk: per-row hyperplane
    bucket from the embedded md5-derived plane literals (values are exact
    dyadic rationals, so the literals round-trip bit-exactly), restrict to
    the bucket of vec_id=0's vector, exact cosine top-k inside it."""
    from ..operators.similarity import _hyperplane

    def bucket_of(emb: str) -> str:
        terms = []
        for p in range(n_planes):
            lit = "[" + ", ".join(repr(v) for v in _hyperplane(dim, p)) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({emb}, {lit}) > 0 "
                f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        return " + ".join(terms)

    emb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
WITH b AS (
  SELECT vec_id, {emb} AS e, ({bucket_of(emb)}) AS bucket FROM embeddings
),
qv AS (SELECT e AS q, bucket AS qb FROM b WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_dot_product(e, q) / sqrt(list_dot_product(e, e))
           / sqrt(list_dot_product(q, q)) AS sim
  FROM b, qv WHERE b.bucket = qv.qb
)
SELECT vec_id, CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
FROM s ORDER BY sim_micro DESC, vec_id LIMIT {k}"""


def ivf_topk_sql(n_centroids: int = 8, n_probe: int = 2, k: int = 10) -> str:
    """Mirror of operators.similarity.ivf_* : centroids are re-derived with
    the identical deterministic rule (smallest md5(CAST(id AS VARCHAR)),
    ties by id), assignment is argmax of list_dot_product(v, c)/sqrt(|c|²)
    with lowest-cid tie-break (row_number ORDER BY s DESC, cid ==
    array_position-first on bit-equal doubles), probe = top n_probe
    centroids by the same score against the query, exact cosine inside."""
    return f"""
WITH c AS (
  SELECT row_number() OVER (ORDER BY md5v, vid) - 1 AS cid, ce
  FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS md5v, vec_id AS vid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        FROM embeddings ORDER BY 1, 2 LIMIT {n_centroids})
),
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
assign AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           list_dot_product(v.e, c.ce) / sqrt(list_dot_product(c.ce, c.ce)) AS s
    FROM v CROSS JOIN c
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) = 1
),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
qprobe AS (
  SELECT cid FROM (
    SELECT c.cid,
           list_dot_product(q.qe, c.ce) / sqrt(list_dot_product(c.ce, c.ce)) AS s
    FROM c CROSS JOIN q
  ) QUALIFY row_number() OVER (ORDER BY s DESC, cid) <= {n_probe}
),
s AS (
  SELECT a.vec_id,
         list_dot_product(a.e, q.qe) / sqrt(list_dot_product(a.e, a.e))
           / sqrt(list_dot_product(q.qe, q.qe)) AS sim
  FROM assign a JOIN qprobe p ON a.cid = p.cid CROSS JOIN q
)
SELECT vec_id, CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
FROM s ORDER BY sim_micro DESC, vec_id LIMIT {k}"""


def embedding_near_dedup_sql(dim: int = 64, threshold_micro: int = 0) -> str:
    """Mirror of the embedding_near_dedup gate: connected components over
    the verified embedding-cosine near-dup pairs, one keep (min id) per
    component — the CC composition applied to the EMBEDDING family."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b FROM ({embedding_dup_pairs_sql(dim=dim,
                                                   threshold_micro=threshold_micro)})
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u, least(u, min(v)) AS c FROM reach GROUP BY u)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT u FROM comp WHERE u <> c)"""


def pq_topk_sql(m: int = 4, k_c: int = 8, k: int = 10, dim: int = 64) -> str:
    """Mirror of operators.similarity.pq_*: sub-centroids re-derived with
    the IVF sampling rule, per-subspace codes by L2 argmin (lowest-cid
    ties), ADC = Σ_s dt[s][code_s] with every distance expanded as
    ldp(a,a) - 2·ldp(a,b) + ldp(b,b) — the identical fold composition the
    Spark side evaluates, so doubles match bit-for-bit before the micro
    floor."""
    sub = dim // m

    def sl(expr: str, s: int) -> str:
        return f"list_slice({expr}, {s * sub + 1}, {(s + 1) * sub})"

    def d2(a: str, b: str) -> str:
        return (f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
                f" + list_dot_product({b}, {b}))")

    codes = ",\n".join(
        f"""code{s} AS (
  SELECT vec_id, cid AS c{s} FROM (
    SELECT v.vec_id, c.cid, {d2(sl('v.e', s), sl('c.ce', s))} AS d
    FROM v CROSS JOIN c)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
)"""
        for s in range(m)
    )
    dts = ",\n".join(
        f"""dt{s} AS (
  SELECT c.cid, {d2(sl('q.qe', s), sl('c.ce', s))} AS d
  FROM c CROSS JOIN q
)"""
        for s in range(m)
    )
    joins = "\n".join(
        f"JOIN code{s} USING (vec_id)" for s in range(1, m)
    ) + "\n" + "\n".join(
        f"JOIN dt{s} ON dt{s}.cid = code{s}.c{s}" for s in range(m)
    )
    adc = " + ".join(f"dt{s}.d" for s in range(m))
    return f"""
WITH c AS (
  SELECT row_number() OVER (ORDER BY md5v, vid) - 1 AS cid, ce
  FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS md5v, vec_id AS vid,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        FROM embeddings ORDER BY 1, 2 LIMIT {k_c})
),
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
{codes},
{dts}
SELECT code0.vec_id,
       CAST(floor(({adc}) * 1000000) AS BIGINT) AS adc_micro
FROM code0
{joins}
ORDER BY adc_micro, code0.vec_id LIMIT {k}"""


def embedding_dup_pairs_sql(dim: int = 64, n_planes: int = 8,
                            threshold_micro: int = 0) -> str:
    """Mirror of operators.similarity.embedding_dup_pairs: full-signature
    bucket self-join + exact cosine, micro-integerized."""
    from ..operators.similarity import _hyperplane

    emb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    terms = []
    for p in range(n_planes):
        lit = "[" + ", ".join(repr(v) for v in _hyperplane(dim, p)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb}, {lit}) > 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH b AS (SELECT vec_id, {emb} AS e, ({bucket}) AS bucket FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, x.vec_id AS id_b,
         list_dot_product(a.e, x.e) / sqrt(list_dot_product(a.e, a.e))
           / sqrt(list_dot_product(x.e, x.e)) AS sim
  FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
)
SELECT id_a, id_b, CAST(floor(sim * 1000000) AS BIGINT) AS sim_micro
FROM p WHERE CAST(floor(sim * 1000000) AS BIGINT) >= {threshold_micro}"""


def jaccard_pairs_sql(threshold_millis: int = 100, num_hashes: int = 8,
                      band_size: int = 2, k: int = 5,
                      max_bucket: int = 256) -> str:
    """LSH candidate pairs verified by exact shingle Jaccard, mirroring
    operators.dedup.jaccard_pairs: candidates from shared (band_id,
    band_key) in buckets of at most ``max_bucket`` docs, intersection via
    ``list_intersect`` over md5-int64-hashed distinct shingle sets,
    integerized to 1/1000ths with the same floor(1000.0*i/u) double math."""
    sigs = [
        f"list_min(list_transform(sh, s -> {_hash64_sql(q(str(j) + ':') + ' || s')})) AS s{j}"
        for j in range(num_hashes)
    ]
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        key_parts = " || ',' || ".join(
            f"CAST(s{b * band_size + i} AS VARCHAR)" for i in range(band_size)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({key_parts}) AS band_key FROM sigs"
        )
    union = "\nUNION ALL\n".join(band_selects)
    cap = (
        f"""
capped AS (
  SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= {max_bucket}
),"""
        if max_bucket
        else """
capped AS (SELECT * FROM bands),"""
    )
    return f"""
WITH sh AS (SELECT doc_id, list_distinct(list_transform({_shingle_sql(k)},
                                          s -> {_hash64_sql('s')})) AS sh
            FROM documents),
shs AS (SELECT doc_id, {_shingle_sql(k)} AS sh FROM documents),
sigs AS (SELECT doc_id, {', '.join(sigs)} FROM shs),
bands AS ({union}),{cap}
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
j AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
       CAST(floor(1000.0 * inter / (na + nb - inter)) AS BIGINT) AS jaccard_millis
FROM j
WHERE CAST(floor(1000.0 * inter / (na + nb - inter)) AS BIGINT) >= {threshold_millis}"""


def pack_sequences_sql(budget: int = 64, n_shards: int = 8,
                       salt: str = "pack") -> str:
    """Next-fit whole-doc sequence packing (operators.pack.pack_sequences)
    as a linear recursive CTE: rows ordered by (md5 shuffle key, doc_id)
    within each hash shard; the recursion carries (pack_id, cum) per shard
    and steps every shard's row k jointly.  Token counts clip to the
    budget exactly as the Spark side does."""
    t = r"len(regexp_extract_all(text, '\S+'))"
    shard = _hash64_sql(f"'{salt}:' || CAST(doc_id AS VARCHAR)") + f" % {n_shards}"
    key = _hash64_sql("'shuffle:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH RECURSIVE ord AS (
  SELECT doc_id,
         LEAST(CAST({t} AS BIGINT), {budget}) AS t,
         {shard} AS shard,
         {key} AS key,
         CAST(row_number() OVER (PARTITION BY {shard}
                                 ORDER BY {key}, doc_id) AS BIGINT) - 1 AS rn
  FROM documents
), packed AS (
  SELECT shard, rn, doc_id, t,
         CAST(0 AS BIGINT) AS pack_id, t AS cum, 0 AS pos
  FROM ord WHERE rn = 0
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.t,
         CASE WHEN p.cum + o.t > {budget} THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.cum + o.t > {budget} THEN o.t ELSE p.cum + o.t END,
         CASE WHEN p.cum + o.t > {budget} THEN 0 ELSE p.pos + 1 END
  FROM ord o JOIN packed p ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, shard, pack_id, CAST(pos AS INT) AS pos, t AS n_tokens
FROM packed"""


def chunk_spans_sql(seq_len: int = 128, n_buckets: int = 16) -> str:
    """GPT-style concat-and-chunk spans (operators.pack.chunk_spans) as ONE
    global window cumsum over the deterministic order (bucket, key, id) —
    the oracle can afford the global window the Spark side decomposes into
    per-bucket prefix sums."""
    t = r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)"
    key = _hash64_sql("'shuffle:' || CAST(doc_id AS VARCHAR)")
    first = f"CAST(floor(start_off / {seq_len}) AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, {t} AS n_tokens,
         {key} AS key, {key} % {n_buckets} AS bucket
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, bucket,
         COALESCE(SUM(n_tokens) OVER (ORDER BY bucket, key, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start_off
  FROM toks)
SELECT doc_id, n_tokens, bucket, start_off,
       start_off + n_tokens AS end_off,
       {first} AS first_seq,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((start_off + n_tokens - 1) / {seq_len}) AS BIGINT)
            ELSE {first} END AS last_seq
FROM c"""


def pii_scrub_sql(text_expr: str = "text") -> str:
    """PII redaction cascade (functions.pii) over ``text_expr``: per-category
    counts under the sequential-cascade semantics (category k counted on the
    text AFTER categories 1..k-1 replaced) plus the md5 of the fully
    scrubbed text.  Patterns come from the same PII_PATTERNS table the
    Spark side compiles, so the two engines share one source of truth."""
    from ..functions.pii import PII_PATTERNS

    cur = text_expr
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        count_cols.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    cols = ",\n       ".join(count_cols)
    return f"""
SELECT doc_id,
       {cols},
       md5({cur}) AS scrubbed_md5
FROM documents"""


#: deterministic PII augmentation for the gate corpus (the synthetic
#: documents contain no PII-shaped text, so the gate injects one of each
#: category, derived from doc_id — identical expression on both engines)
PII_AUG_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.com or 555-' || "
    "CAST(100 + doc_id % 900 AS VARCHAR) || '-' || "
    "CAST(1000 + doc_id % 9000 AS VARCHAR) || ' card 4111-1111-1111-' || "
    "CAST(1000 + doc_id % 9000 AS VARCHAR) || ' ssn ' || "
    "CAST(100 + doc_id % 900 AS VARCHAR) || '-' || "
    "CAST(10 + doc_id % 90 AS VARCHAR) || '-' || "
    "CAST(1000 + doc_id % 9000 AS VARCHAR) || ' host 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
)


def vocab_top_terms_sql(n: int = 100) -> str:
    """Corpus vocabulary head (functions.text.vocab_top_terms): whitespace
    terms of the normalized text with occurrence + doc-frequency counts,
    top-n by occurrences with the term string as deterministic tie-break.
    Whitespace is the EXPLICIT class on both engines (Java \\s includes
    \\x0B, RE2's does not — code-review r5)."""
    base = r"trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"
    term_re = r"'[^ \t\n\x0B\f\r]+'"
    return f"""
SELECT term,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, unnest(regexp_extract_all({base}, {term_re})) AS term
  FROM documents
)
GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT {n}"""


def length_percentiles_sql() -> str:
    """Per-source token-length percentiles (functions.text
    .length_percentiles, exact form): DuckDB quantile_cont uses the same
    (n-1)*p linear interpolation as Spark's percentile, and the
    milli-floor integerizes the shared IEEE double."""
    return r"""
SELECT source,
       CAST(floor(1000 * quantile_cont(t, 0.5)) AS BIGINT) AS p50,
       CAST(floor(1000 * quantile_cont(t, 0.9)) AS BIGINT) AS p90,
       CAST(floor(1000 * quantile_cont(t, 0.99)) AS BIGINT) AS p99
FROM (
  SELECT source, len(regexp_extract_all(text, '\S+')) AS t FROM documents
)
GROUP BY source"""


def _bands_cte_side(num_hashes: int, band_size: int, k: int,
                    suffix: str, where: str) -> str:
    """One side's sh → sigs → bands CTE chain with a row filter — the
    bipartite (incremental) variant of _bands_cte; same signature scheme so
    the banding cannot drift from the batch-family oracles."""
    sigs = [
        f"list_min(list_transform(sh, s -> {_hash64_sql(q(str(j) + ':') + ' || s')})) AS s{j}"
        for j in range(num_hashes)
    ]
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        key_parts = " || ',' || ".join(
            f"CAST(s{b * band_size + i} AS VARCHAR)" for i in range(band_size)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({key_parts}) AS band_key "
            f"FROM sigs_{suffix}"
        )
    union = "\nUNION ALL\n".join(band_selects)
    return f"""
sh_{suffix} AS (SELECT doc_id, {_shingle_sql(k)} AS sh FROM documents {where}),
sigs_{suffix} AS (SELECT doc_id, {', '.join(sigs)} FROM sh_{suffix}),
bands_{suffix} AS ({union})"""


def incremental_dedup_sql(split_id: int = 400, threshold_millis: int = 500,
                          num_hashes: int = 8, band_size: int = 2,
                          k: int = 5) -> str:
    """Mirror of operators.dedup.incremental_dedup over a split corpus:
    docs with id < split are the EXISTING corpus, >= split the NEW batch.
    Surviving new docs = not an exact digest match against existing, and no
    bipartite LSH candidate verifying at Jaccard >= threshold."""
    new_w = f"WHERE doc_id >= {split_id}"
    old_w = f"WHERE doc_id < {split_id}"
    hs = (f"list_distinct(list_transform({_shingle_sql(k)}, "
          f"s -> {_hash64_sql('s')}))")
    return f"""
WITH {_bands_cte_side(num_hashes, band_size, k, 'n', new_w)},
{_bands_cte_side(num_hashes, band_size, k, 'e', old_w)},
cand AS (
  SELECT DISTINCT n.doc_id AS id_new, e.doc_id AS id_old
  FROM bands_n n JOIN bands_e e
    ON n.band_id = e.band_id AND n.band_key = e.band_key
),
shx_n AS (SELECT doc_id, {hs} AS hs FROM documents {new_w}),
shx_e AS (SELECT doc_id, {hs} AS hs FROM documents {old_w}),
j AS (
  SELECT c.id_new,
         len(list_intersect(a.hs, b.hs)) AS inter,
         len(a.hs) AS na, len(b.hs) AS nb
  FROM cand c
  JOIN shx_n a ON a.doc_id = c.id_new
  JOIN shx_e b ON b.doc_id = c.id_old
),
drops AS (
  SELECT DISTINCT id_new FROM j
  WHERE CAST(floor(1000.0 * inter / (na + nb - inter)) AS BIGINT)
        >= {threshold_millis}
)
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id >= {split_id}
  AND md5(d.text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < {split_id})
  AND d.doc_id NOT IN (SELECT id_new FROM drops)"""
