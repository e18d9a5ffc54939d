"""Tokenizer parity vs the reference's ``re.findall(r"[\\w']+", s.lower())``
(``app/mapreduce/mapper1.py:18``) on adversarial inputs — SURVEY.md §5.3."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.functions.text import tokenize

CASES = [
    "Hello World",
    "don't stop believin'",
    "snake_case and CamelCase",
    "digits 123 mixed a1b2",
    "café résumé naïve",
    "中文 分词 测试",
    "emoji 🙂 split",
    "tabs\tand\nnewlines",
    "  leading and trailing  ",
    "",
    "   ",
    "!!!punct---only???",
    "a'b''c",
    "UPPER lower MiXeD",
    "hyphen-ated words",
    "ünïcödé_wörds",
    "ひらがな and katakana カタカナ",
    "numbers 3.14 and 1,000",
]


def _reference_tokenize(s: str) -> list[str]:
    return re.findall(r"[\w\']+", s.lower())


@pytest.mark.parametrize("text", CASES)
def test_parity_with_reference_regex(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(tokenize("text").alias("toks"))
        .first()
    )
    assert row["toks"] == _reference_tokenize(text)


def test_null_text_tokenizes_to_null(spark):
    row = (
        spark.createDataFrame([(None,)], "text string")
        .select(tokenize("text").alias("toks"))
        .first()
    )
    assert row["toks"] is None
