"""ExecPython escape hatch: arbitrary user Python over Arrow batches.

Reference: modifier.ExecPython
(/root/reference/lumbermill/modifier/ExecPython.py:41-65) exec()s a
user source string once to define imports/functions, then evals a
per-event code block against each event dict.

Spark shape (SURVEY.md promises "escape hatch = mapInPandas"): the user
supplies either a callable ``fn(pdf: pandas.DataFrame) ->
pandas.DataFrame`` or a ``code`` string that defines ``transform(pdf)``;
it runs via ``mapInPandas`` — Arrow-batched, constant memory per
partition, never per-row Python. The output schema defaults to the
input schema (in-place event mutation, the reference's common case) and
must be declared explicitly when the transform changes columns.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def exec_python(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    code: str | None = None,
    schema=None,
) -> DataFrame:
    """Apply user Python per Arrow batch.

    - ``fn``: a pandas-DataFrame-to-pandas-DataFrame callable.
    - ``code``: source text defining ``transform(pdf)`` (exec'd once
      per executor worker, like the reference's module-level exec).
    - ``schema``: output schema (DDL string or StructType); defaults to
      the input schema.
    """
    if (fn is None) == (code is None):
        raise ValueError("exactly one of fn/code is required")
    out_schema = schema if schema is not None else df.schema

    if code is not None:
        src = code

        def fn(pdf: pd.DataFrame, _src=src, _ns={}) -> pd.DataFrame:  # noqa: B006
            if "transform" not in _ns:
                exec(_src, _ns)  # noqa: S102 - the escape hatch's contract
                if "transform" not in _ns:
                    raise ValueError(
                        "ExecPython code must define transform(pdf)")
            return _ns["transform"](pdf)

    user = fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = user(pdf)
            if not isinstance(out, pd.DataFrame):
                raise TypeError("ExecPython transform must return a "
                                "pandas DataFrame")
            yield out

    return df.mapInPandas(run, out_schema)
