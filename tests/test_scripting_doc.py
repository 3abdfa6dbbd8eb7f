"""Executes every python code block in docs/scripting.md — the engine's
literate-doc test (the reference runs doc/scripting.rst as a doctest
corpus, ``tests/test_doctests.py:69-73``)."""

import os
import re

HERE = os.path.dirname(__file__)
DOC = os.path.join(HERE, "..", "docs", "scripting.md")


def test_scripting_doc_executes(spark):
    src = open(DOC, encoding="utf-8").read()
    blocks = re.findall(r"```python\n(.*?)```", src, re.S)
    assert len(blocks) >= 5
    env = {
        "AIRPASSENGERS_CSV": os.path.join(HERE, "data",
                                          "airpassengers.csv"),
    }
    for i, block in enumerate(blocks):
        # the doc opens its own session; reuse the test session instead
        block = block.replace(
            'spark = get_spark("scripting", master="local[2]")',
            "spark = spark")
        env["spark"] = spark
        exec(compile(block, f"{DOC}#block{i}", "exec"), env)
