"""Python UDTF surface (SURVEY.md §2.10) — Spark 3.5+/4.x user-defined
TABLE functions, registered for SQL lateral use.

The reference engine has no UDF surface at all (its transforms are
built-in column ops), so this tier exists to make the ENGINE complete:
a user who needs a one-to-many row generator Spark's built-ins can't
express gets the idiomatic Spark 4 extension point, not a collect loop.

Design notes:

- UDTFs run Python per input row — the SLOW path. Everything these
  demo UDTFs compute is ALSO expressible with explode()/sequence()
  built-ins (see ``operators/chunking.py`` for the pure-Catalyst
  version); unit tests pin UDTF output ≡ the built-in plan so the fast
  path stays the documented default. Reach for a UDTF only when the
  row-generation logic genuinely needs imperative Python.
- ``NgramUDTF`` tokenizes EXACTLY like ``functions.text.tokens``
  (split ``\\s+`` of trimmed text, blank -> no rows) so its output joins
  cleanly against the rest of the text tier and has a DuckDB oracle.
- Analysis-time schema: ``returnType`` is declared on the class, so
  Catalyst plans column pruning/filters around the generator without
  executing Python.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


def _make_udtfs():
    """Build the UDTF classes in FUNCTION scope so cloudpickle serializes
    them BY VALUE (a module-top-level class pickles by reference, and the
    executor Python worker then has to import this engine package — which
    fails whenever the driver runs from a foreign cwd without the repo on
    PYTHONPATH: the r15 driver-simulation regression). Bodies are fully
    self-contained (stdlib ``re`` imported inside ``eval``, tokenizer
    inlined — the multimodal/ops.py closure contract), so the pickled
    value needs nothing from this module at unpickle time. Tokenization
    must stay EXACTLY ``functions.text.tokens`` (split \\s+ of trim,
    blank -> no rows) — pinned against the built-in plan in
    tests/test_udtfs.py."""

    @udtf(returnType="pos int, ngram string")
    class NgramUDTF:
        """Emit one row per word n-gram of the input text: (pos, ngram),
        pos 0-based, tokens joined by a single space. Blank/short text
        yields no rows (same contract as explode of an empty array)."""

        def eval(self, text: str, n: int):  # noqa: D102 — Spark UDTF protocol
            import re as _re

            if text is None:
                return
            t = text.strip()
            toks = _re.split(r"\s+", t) if t else []
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

    @udtf(returnType="start int, length int, piece string")
    class FixedWidthChunkUDTF:
        """Emit fixed-width character chunks of the input (start, length,
        piece) — the imperative twin of operators/chunking.py's
        explode(sequence)+substr plan (which remains the scale path)."""

        def eval(self, text: str, width: int):  # noqa: D102
            if text is None or width <= 0:
                return
            for s in range(0, len(text), width):
                piece = text[s : s + width]
                yield s, len(piece), piece

    return NgramUDTF, FixedWidthChunkUDTF


NgramUDTF, FixedWidthChunkUDTF = _make_udtfs()


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use (idempotent):
    ``ngrams(text, n)`` and ``fixed_chunks(text, width)``."""
    spark.udtf.register("ngrams", NgramUDTF)
    spark.udtf.register("fixed_chunks", FixedWidthChunkUDTF)
