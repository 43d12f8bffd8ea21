"""Instruction/SFT conversation curation — the post-pretraining data
stage: parse role-tagged conversations, compute the structural-quality
signals an SFT filter gates on, and derive the prompt-level dedup key.

Format: one turn per line, ``role: content`` (the interchange shape
chat corpora ship in when flattened to text). Everything is ONE
whole-stage-codegen projection over higher-order functions
(split/transform/filter/aggregate) — no UDF, no shuffle; the signals:

- ``n_turns`` / ``n_user`` / ``n_assistant`` — turn mass by role;
- ``starts_user`` — a conversation must open with the user;
- ``alternates`` — strict role alternation (consecutive same-role turns
  are the classic concatenation artifact);
- ``assistant_share`` — assistant chars / total content chars (a corpus
  whose assistant share collapses is prompts-only; one that saturates
  is completions-only);
- ``prompt_digest`` — md5 of the FIRST user turn's content, the dedup
  key: instruction sets are deduplicated by prompt, not whole
  conversation, so paraphrase-mined answer variants collapse.

Engine-exact: role split is ``^role: `` prefix parsing (first colon
only — content keeps its own colons), md5 is hex parity with DuckDB,
and the share is an unrounded int/int division.

Scale shape: zero shuffle — a linear projection; dedup/groupBy composes
downstream on ``prompt_digest`` exactly like `dedup.exact_dedup`.

Reference comparables: none in bertrandchenal/lakota; extends the
LLM-pipeline surface (SURVEY.md §2.12 ladder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROLE_RE = r"^([A-Za-z]+): "


def conversation_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """(id, n_turns, n_user, n_assistant, starts_user, alternates,
    assistant_share, prompt_digest) per conversation."""
    import re

    # the role parameters are interpolated into SQL lambda strings below
    # AND must be matchable by the `^[A-Za-z]+: ` turn regex — validate
    # both at once instead of failing with a ParseException (or silently
    # never matching) downstream
    for role in (user_role, assistant_role):
        if not re.fullmatch(r"[A-Za-z]+", role):
            raise ValueError(
                f"role names must be alphabetic (got {role!r}) — the turn "
                "format is '<role>: content' with [A-Za-z]+ roles"
            )
    turns = F.split(F.col(text_col), "\n")
    roles = F.transform(
        turns, lambda t: F.regexp_extract(t, _ROLE_RE, 1)
    )
    contents = F.transform(
        turns, lambda t: F.regexp_replace(t, _ROLE_RE, "")
    )
    base = df.select(
        F.col(id_col),
        roles.alias("_roles"),
        contents.alias("_contents"),
    )
    n_user = F.size(
        F.filter("_roles", lambda r: r == F.lit(user_role))
    ).cast("long")
    n_assistant = F.size(
        F.filter("_roles", lambda r: r == F.lit(assistant_role))
    ).cast("long")
    # strict alternation: every adjacent pair differs in role
    alternates = F.expr(
        "aggregate(zip_with(slice(_roles, 1, size(_roles) - 1),"
        " slice(_roles, 2, size(_roles) - 1), (a, b) -> a = b),"
        " true, (acc, same) -> acc and not same)"
    )
    chars_of = (
        "aggregate(zip_with(_roles, _contents,"
        " (r, c) -> if(r = '{role}', length(c), 0L)),"
        " 0L, (acc, v) -> acc + v)"
    )
    user_chars = F.expr(chars_of.format(role=user_role))
    asst_chars = F.expr(chars_of.format(role=assistant_role))
    first_user = F.expr(
        f"get(filter(zip_with(_roles, _contents, (r, c) -> struct(r, c)),"
        f" p -> p.r = '{user_role}'), 0).c"
    )
    return base.select(
        id_col,
        F.size("_roles").cast("long").alias("n_turns"),
        n_user.alias("n_user"),
        n_assistant.alias("n_assistant"),
        (F.element_at("_roles", 1) == F.lit(user_role)).alias(
            "starts_user"
        ),
        alternates.alias("alternates"),
        (
            asst_chars
            / F.greatest(user_chars + asst_chars, F.lit(1))
        ).alias("assistant_share"),
        F.md5(F.coalesce(first_user, F.lit(""))).alias("prompt_digest"),
    )
