"""String accessor: pandas ``Series.str`` on Catalyst string functions.

Reference: pandas/core/strings/accessor.py:150 (StringMethods, ~60
methods; the Arrow-backed fast path in arrays/string_arrow.py:89
dispatches to pyarrow.compute — the same "vectorized kernel" role
Catalyst's string expressions play here). Every method below is a
built-in JVM expression (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pandas_spark import fshim as F  # backtick-safe F.col facade


class StringMethods:
    __slots__ = ("_c",)

    def __init__(self, col: Column):
        self._c = col

    def _wrap(self, c: Column):
        from pandas_spark.expr import Expr

        return Expr(c)

    # -- predicates -----------------------------------------------------
    def contains(self, pat: str, regex: bool = True, case: bool = True,
                 na=None):
        """``na=`` (accessor.py contains): fill for NULL inputs —
        pandas' default NaN is the engine's NULL (no fill)."""
        if regex:
            pat2 = pat if case else f"(?i){pat}"
            out = self._c.rlike(pat2)
        elif not case:
            out = F.lower(self._c).contains(pat.lower())
        else:
            out = self._c.contains(pat)
        if na is not None:
            out = F.coalesce(out, F.lit(bool(na)))
        return self._wrap(out)

    def startswith(self, pat: str):
        return self._wrap(self._c.startswith(pat))

    def endswith(self, pat: str):
        return self._wrap(self._c.endswith(pat))

    def match(self, pat: str):
        return self._wrap(self._c.rlike(f"^(?:{pat})"))

    def fullmatch(self, pat: str):
        return self._wrap(self._c.rlike(f"^(?:{pat})$"))

    def isalnum(self):   return self._wrap(self._c.rlike(r"^[a-zA-Z0-9]+$"))
    def isalpha(self):   return self._wrap(self._c.rlike(r"^[a-zA-Z]+$"))
    def isdigit(self):   return self._wrap(self._c.rlike(r"^[0-9]+$"))
    def isnumeric(self): return self._wrap(self._c.rlike(r"^[0-9]+$"))
    def isspace(self):   return self._wrap(self._c.rlike(r"^\s+$"))
    def isdecimal(self):
        # ASCII decimals (accessor.py isdecimal); unicode digit classes
        # (e.g. '²' false here and in pandas) match — superscripts are
        # isdigit-only in pandas, excluded by both engines' [0-9]
        return self._wrap(self._c.rlike(r"^[0-9]+$"))

    def istitle(self):
        """Python str.istitle: every maximal alpha run is Uppercase
        followed by lowercase only, and at least one cased char."""
        return self._wrap(
            self._c.rlike(r"^(?:[^A-Za-z]*[A-Z][a-z]*(?![A-Za-z]))+[^A-Za-z]*$")
        )
    def islower(self):   return self._wrap((self._c == F.lower(self._c)) & self._c.rlike("[a-zA-Z]"))
    def isupper(self):   return self._wrap((self._c == F.upper(self._c)) & self._c.rlike("[a-zA-Z]"))

    # -- transforms ------------------------------------------------------
    def lower(self):      return self._wrap(F.lower(self._c))
    def upper(self):      return self._wrap(F.upper(self._c))
    def title(self):
        """Python str.title semantics (any non-alpha is a word
        boundary: "it\'s" → "It\'S", "hello-world" → "Hello-World") —
        Spark initcap splits on WHITESPACE only, a silent divergence
        caught by the r11 sweep. JVM-side: char-sequence transform
        uppercases every alpha that follows a non-alpha."""
        return self._wrap(F.expr(
            f"""array_join(transform(
                  sequence(1, length({{c}})),
                  i -> CASE
                    WHEN substring({{c}}, i, 1) NOT RLIKE '[A-Za-z]'
                      THEN substring({{c}}, i, 1)
                    WHEN i = 1 OR substring({{c}}, i-1, 1) NOT RLIKE '[A-Za-z]'
                      THEN upper(substring({{c}}, i, 1))
                    ELSE lower(substring({{c}}, i, 1))
                  END), '')""".replace("{c}", f"({_sql(self._c)})")
        ))
    def capitalize(self):
        return self._wrap(
            F.concat(F.upper(F.substring(self._c, 1, 1)), F.lower(F.expr(f"substring({_sql(self._c)}, 2)")))
        )

    def swapcase(self):
        # no builtin; char-level transform via HOF (still JVM-side)
        return self._wrap(
            F.array_join(
                F.transform(
                    F.split(self._c, ""),
                    lambda ch: F.when(ch == F.lower(ch), F.upper(ch)).otherwise(F.lower(ch)),
                ),
                "",
            )
        )

    def len(self):        return self._wrap(F.length(self._c))
    def strip(self, to_strip: str | None = None):
        return self._wrap(F.trim(self._c) if to_strip is None else F.expr(f"trim(BOTH '{to_strip}' FROM {_sql(self._c)})"))

    def lstrip(self, to_strip: str | None = None):
        return self._wrap(F.ltrim(self._c) if to_strip is None else F.expr(f"trim(LEADING '{to_strip}' FROM {_sql(self._c)})"))

    def rstrip(self, to_strip: str | None = None):
        return self._wrap(F.rtrim(self._c) if to_strip is None else F.expr(f"trim(TRAILING '{to_strip}' FROM {_sql(self._c)})"))

    def replace(self, pat: str, repl: str, regex: bool = True, n: int = -1):
        """``n=`` (max replacements, Python str.replace/re.sub count):
        no Catalyst builtin bounds the replacement count, so n>0 takes
        the Arrow pandas_udf slow path (same pattern as normalize);
        the default n=-1 stays JVM-side."""
        if n is not None and n > 0:
            import re as _re

            if regex:
                pat_c = _re.compile(pat)
                fn = lambda x: pat_c.sub(repl, x, count=n)
            else:
                fn = lambda x: x.replace(pat, repl, n)

            @F.pandas_udf("string")
            def _repl(s: pd.Series) -> pd.Series:
                return s.map(fn, na_action="ignore")

            return self._wrap(_repl(self._c))
        if regex:
            return self._wrap(F.regexp_replace(self._c, pat, repl))
        return self._wrap(F.replace(self._c, F.lit(pat), F.lit(repl)))

    def repeat(self, n: int):
        return self._wrap(F.repeat(self._c, n))

    def reverse(self):
        return self._wrap(F.reverse(self._c))

    def _no_truncate(self, padded, width: int):
        # pandas pad/zfill never truncate longer strings; Spark's
        # lpad/rpad do — keep the original when already >= width
        return F.when(F.length(self._c) >= width, self._c).otherwise(padded)

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        if side == "left":
            return self._wrap(self._no_truncate(F.lpad(self._c, width, fillchar), width))
        if side == "right":
            return self._wrap(self._no_truncate(F.rpad(self._c, width, fillchar), width))
        # both: lpad to center
        total = F.lit(width) - F.length(self._c)
        lpad_w = F.length(self._c) + F.floor(total / 2).cast("int")
        return self._wrap(F.rpad(F.lpad(self._c, lpad_w.cast("int"), fillchar), width, fillchar))

    def center(self, width: int, fillchar: str = " "):
        return self.pad(width, "both", fillchar)

    def ljust(self, width: int, fillchar: str = " "):
        return self.pad(width, "right", fillchar)

    def rjust(self, width: int, fillchar: str = " "):
        return self.pad(width, "left", fillchar)

    def zfill(self, width: int):
        """Python str.zfill: a leading +/- sign stays AHEAD of the
        zeros ('-5'.zfill(4) == '-005'); a bare lpad would produce
        '00-5' (r11 reference sweep catch, accessor.py zfill)."""
        sign = F.substring(self._c, 1, 1)
        signed = sign.isin("+", "-")
        rest = F.substring(self._c, 2, 2_147_483_646)
        padded_signed = F.concat(
            sign, self._no_truncate(F.lpad(rest, width - 1, "0"), width - 1)
        )
        return self._wrap(
            F.when(self._c.isNull(), F.lit(None).cast("string"))
            .when(signed, padded_signed)
            .otherwise(self._no_truncate(F.lpad(self._c, width, "0"), width))
        )

    def slice(self, start: int | None = None, stop: int | None = None,
              step: int | None = None):
        """Python slice semantics per element (accessor.py:2239):
        negative indices and any non-zero step. The common forward
        case stays a single ``substring``; the general case compiles
        to a char-array ``transform`` over a ``sequence`` of python
        ``slice.indices()`` positions — all JVM-side, no UDF."""
        step = 1 if step is None else step
        if step == 0:
            raise ValueError("slice step cannot be zero")
        if step == 1 and (start is None or start >= 0) and (stop is None or stop >= 0):
            start0 = start or 0
            if stop is None:
                return self._wrap(F.expr(f"substring({_sql(self._c)}, {start0 + 1})"))
            return self._wrap(F.substring(self._c, start0 + 1, max(stop - start0, 0)))
        c = _sql(self._c)
        arr = f"split({c}, '')"
        n = f"size({arr})"
        if step > 0:
            b = "0" if start is None else (
                f"greatest({n} + ({start}), 0)" if start < 0 else f"least({start}, {n})"
            )
            e = n if stop is None else (
                f"greatest({n} + ({stop}), 0)" if stop < 0 else f"least({stop}, {n})"
            )
            empty, seq = f"{b} >= {e}", f"sequence({b}, {e} - 1, {step})"
        else:
            b = f"{n} - 1" if start is None else (
                f"greatest({n} + ({start}), -1)" if start < 0 else f"least({start}, {n} - 1)"
            )
            e = "-1" if stop is None else (
                f"greatest({n} + ({stop}), -1)" if stop < 0 else f"least({stop}, {n} - 1)"
            )
            empty, seq = f"{b} <= {e}", f"sequence({b}, {e} + 1, {step})"
        return self._wrap(F.expr(
            f"CASE WHEN {c} IS NULL THEN NULL WHEN {empty} THEN '' "
            f"ELSE concat_ws('', transform({seq}, i -> element_at({arr}, i + 1))) END"
        ))

    def slice_replace(self, start: int = 0, stop: int | None = None, repl: str = ""):
        """s[:start] + repl + s[stop:] (accessor.py:2339); non-negative
        indices, like ``slice``."""
        head = F.substring(self._c, 1, start)
        if stop is None:
            return self._wrap(F.concat(head, F.lit(repl)))
        tail = F.expr(f"substring({_sql(self._c)}, {stop + 1})")
        return self._wrap(F.concat(head, F.lit(repl), tail))

    def get(self, i: int):
        return self._wrap(F.substring(self._c, i + 1, 1))

    def removeprefix(self, prefix: str):
        return self._wrap(
            F.when(self._c.startswith(prefix), F.expr(f"substring({_sql(self._c)}, {len(prefix) + 1})")).otherwise(self._c)
        )

    def removesuffix(self, suffix: str):
        return self._wrap(
            F.when(self._c.endswith(suffix),
                   F.substring(self._c, 1, F.length(self._c) - len(suffix))).otherwise(self._c)
        )

    def translate(self, table: dict):
        src = "".join(chr(k) for k in table)
        dst = "".join(v if isinstance(v, str) else chr(v) for v in table.values())
        return self._wrap(F.translate(self._c, src, dst))

    def normalize(self, form: str = "NFC"):
        """str.normalize (accessor.py:3100): unicode normalization has
        no Catalyst builtin — Arrow-batched pandas_udf over
        unicodedata.normalize (slow path by design; nulls pass through)."""
        import unicodedata

        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"invalid normalization form: {form!r}")

        @F.pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            return s.map(lambda x: unicodedata.normalize(form, x), na_action="ignore")

        return self._wrap(_norm(self._c))

    # -- split / extract ---------------------------------------------------
    def split(self, pat: str = r"\s+", n: int = -1, regex: bool = True):
        # pandas n = max number of SPLITS; Spark's limit = max number of
        # PARTS — so n splits ⇒ n+1 parts ('a b c'.split(n=1) → ['a','b c'])
        p = pat if regex else _re_escape(pat)
        return self._wrap(F.split(self._c, p, n + 1 if n > 0 else -1))

    def join(self, sep: str):
        return self._wrap(F.array_join(self._c, sep))

    def cat(self, other: Column, sep: str = ""):
        from pandas_spark.expr import _unwrap

        return self._wrap(F.concat_ws(sep, self._c, _unwrap(other)))

    def get_dummies(self, sep: str = "|", categories=None):
        """str.get_dummies (accessor.py:2977): delimiter-separated
        labels → indicator expressions. Returns a dict of name→Expr
        for ``assign(**...)``; pass ``categories`` at scale to skip
        the driver-side discovery scan."""
        if categories is None:
            raise ValueError("pass categories= (a distinct scan is not implicit at scale)")
        toks = F.split(self._c, _re_escape(sep))
        return {
            c: self._wrap(F.array_contains(toks, c).cast("int")) for c in categories
        }

    def extract(self, pat: str, group: int = 1):
        return self._wrap(F.regexp_extract(self._c, pat, group))

    def findall(self, pat: str):
        """pandas findall = re.findall per element: a group-less
        pattern returns FULL matches (idx 0 — the bare
        regexp_extract_all default of idx 1 ERRORS on such patterns,
        r11 sweep catch); one group returns that group; multi-group
        patterns (tuple results) are declared out loudly."""
        import re as _re

        ngroups = _re.compile(pat).groups
        if ngroups >= 2:
            raise NotImplementedError(
                "findall with 2+ capturing groups returns tuples in "
                "pandas; wrap the alternation in (?:...) or extract "
                "groups separately"
            )
        idx = 0 if ngroups == 0 else 1
        return self._wrap(
            F.regexp_extract_all(self._c, F.lit(pat), F.lit(idx))
        )

    def count(self, pat: str):
        return self._wrap(F.regexp_count(self._c, F.lit(pat)))

    def find(self, sub: str):
        return self._wrap(F.locate(sub, self._c) - 1)

    def index(self, sub: str):
        """Python str.index: like find but RAISES when the substring
        is missing (find returns -1) — surfaced as a runtime error
        from the executing query, which is exactly pandas' behavior
        shape (the whole operation fails)."""
        loc = F.locate(sub, self._c)
        return self._wrap(
            F.when(loc == 0, F.raise_error(F.lit("substring not found")))
            .otherwise(loc - 1)
        )

    def partition(self, sep: str):
        pos = F.locate(sep, self._c)
        return self._wrap(
            F.when(
                pos > 0,
                F.struct(
                    F.substring(self._c, 1, pos - 1).alias("head"),
                    F.lit(sep).alias("sep"),
                    F.expr(f"substring({_sql(self._c)}, locate('{sep}', {_sql(self._c)}) + {len(sep)})").alias("tail"),
                ),
            ).otherwise(F.struct(self._c.alias("head"), F.lit("").alias("sep"), F.lit("").alias("tail")))
        )

    def rfind(self, sub: str):
        """Last-occurrence index, 0-based, -1 if absent
        (accessor.py:3635). No rlocate in Spark — locate the reversed
        needle in the reversed haystack and map the position back."""
        p = F.locate(sub[::-1], F.reverse(self._c))
        return self._wrap(
            F.when(p > 0, F.length(self._c) - p - F.lit(len(sub)) + 1).otherwise(F.lit(-1))
        )

    def rindex(self, sub: str):
        return self.rfind(sub)

    def rpartition(self, sep: str):
        """Split at the LAST separator (accessor.py:1163): struct
        (head, sep, tail); ('', '', whole) when absent, like pandas."""
        p = F.locate(sep[::-1], F.reverse(self._c))
        pos = F.length(self._c) - p - F.lit(len(sep)) + 2  # 1-based sep start
        return self._wrap(
            F.when(
                p > 0,
                F.struct(
                    F.substring(self._c, F.lit(1), pos - 1).alias("head"),
                    F.lit(sep).alias("sep"),
                    F.substring(
                        self._c, pos + len(sep), F.length(self._c)
                    ).alias("tail"),
                ),
            ).otherwise(
                F.struct(F.lit("").alias("head"), F.lit("").alias("sep"), self._c.alias("tail"))
            )
        )

    def rsplit(self, sep: str, n: int = -1):
        """Right-anchored split (literal separator): split the reversed
        string, then un-reverse parts and order."""
        rev = F.split(F.reverse(self._c), _re_escape(sep[::-1]), n + 1 if n > 0 else -1)
        return self._wrap(F.reverse(F.transform(rev, lambda x: F.reverse(x))))

    def casefold(self):
        """Aggressive lowercase for caseless matching (accessor.py:4251).
        Spark exposes locale-insensitive ``lower`` only; full Unicode
        casefolding (ß→ss etc.) differs on a handful of codepoints."""
        return self._wrap(F.lower(self._c))

    def extractall(self, pat: str, group: int = 1):
        """All regex matches' ``group`` captures as an array
        (accessor.py:3501) — explode for pandas' one-row-per-match
        MultiIndex shape."""
        return self._wrap(F.regexp_extract_all(self._c, F.lit(pat), F.lit(group)))

    def wrap(self, width: int, **kwargs):
        """str.wrap (accessor.py:2449): textwrap.TextWrapper with
        pandas' defaults (expand_tabs/replace_whitespace/
        drop_whitespace True, no long-word breaking unless asked) —
        Arrow-batched pandas_udf, the declared slow path."""
        import textwrap

        tw = textwrap.TextWrapper(width=width, **kwargs)

        @F.pandas_udf("string")
        def _wrap_udf(s: pd.Series) -> pd.Series:
            return s.map(lambda x: "\n".join(tw.wrap(x)), na_action="ignore")

        return self._wrap(_wrap_udf(self._c))

    def decode(self, encoding: str = "utf-8"):
        return self._wrap(F.decode(self._c, encoding))

    def encode(self, encoding: str = "utf-8"):
        return self._wrap(F.encode(self._c, encoding))


def _sql(c: Column) -> str:
    # best-effort SQL name for simple column refs used inside F.expr
    s = str(c)
    # Column<'name'> → name
    return s.split("'")[1] if "'" in s else s


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)
