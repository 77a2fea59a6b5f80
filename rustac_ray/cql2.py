"""Minimal CQL2 evaluator (text + json) → vectorized Arrow predicates.

Covers the subset the reference exercises (crates/core/src/api/filter.rs:11-70
routes cql2-text/json into an AST; crates/duckdb/src/client.rs:386-394
compiles it to SQL): comparisons (= <> < <= > >=), IS NULL, IN, LIKE,
AND / OR / NOT, parentheses, and S_INTERSECTS(geometry, <geojson literal>).

Reference parity rule (crates/duckdb/src/client.rs:391-393,433-455): if the
filter references a property absent from the table schema, the WHOLE query
short-circuits to the empty result — surfaced here as
:class:`UnknownPropertyError` for the planner to catch.

Evaluation is vectorized: each AST node evaluates to either a numpy/Arrow
array over the whole batch or a scalar; no per-row Python.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_cql2", "Cql2Predicate", "UnknownPropertyError", "to_arrow_filter"]


class UnknownPropertyError(KeyError):
    """Filter references a property not in the schema → empty result set."""


# ------------------------------------------------------------------ parser --

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lpar>\() | (?P<rpar>\)) | (?P<comma>,)
      | (?P<op><>|<=|>=|=|<|>)
      | (?P<arith>[+\-*/%^])
      | (?P<str>'(?:[^']|'')*')
      | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<qword>"[^"]*")
      | (?P<word>[A-Za-z_][A-Za-z0-9_:.]*)
    )""",
    re.X,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"cql2-text tokenize error at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "qword":  # "quoted identifier" → property word
            kind, val = "word", val[1:-1]
        out.append((kind, val))
    out.append(("eof", ""))
    return out


class _TextParser:
    """Recursive descent over: or_expr ← and_expr (OR and_expr)* etc."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind=None, value=None):
        k, v = self.toks[self.i]
        if kind and k != kind:
            raise ValueError(f"expected {kind}, got {k}:{v}")
        if value and v.upper() != value:
            raise ValueError(f"expected {value}, got {v}")
        self.i += 1
        return v

    def parse(self):
        node = self.or_expr()
        self.eat("eof")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek() == ("word", "OR") or (
            self.peek()[0] == "word" and self.peek()[1].upper() == "OR"
        ):
            self.eat("word")
            node = {"op": "or", "args": [node, self.and_expr()]}
        return node

    def and_expr(self):
        node = self.unary_expr()
        while self.peek()[0] == "word" and self.peek()[1].upper() == "AND":
            self.eat("word")
            node = {"op": "and", "args": [node, self.unary_expr()]}
        return node

    def unary_expr(self):
        k, v = self.peek()
        if k == "word" and v.upper() == "NOT":
            self.eat("word")
            return {"op": "not", "args": [self.unary_expr()]}
        if k == "lpar":
            self.eat("lpar")
            node = self.or_expr()
            self.eat("rpar")
            return node
        return self.predicate()

    # operand ← additive; text-form arithmetic with standard precedence
    # (^ over * / % over + -), per the cql2 text grammar
    def operand(self):
        return self.additive()

    def additive(self):
        node = self.multiplicative()
        while self.peek() == ("arith", "+") or self.peek() == ("arith", "-"):
            op = self.eat("arith")
            node = {"op": op, "args": [node, self.multiplicative()]}
        return node

    def multiplicative(self):
        node = self.power()
        while self.peek()[0] == "arith" and self.peek()[1] in ("*", "/", "%"):
            op = self.eat("arith")
            node = {"op": op, "args": [node, self.power()]}
        return node

    def power(self):
        node = self.atom()
        if self.peek() == ("arith", "^"):
            self.eat("arith")
            return {"op": "^", "args": [node, self.power()]}  # right-assoc
        return node

    def atom(self):
        k, v = self.peek()
        if k == "arith" and v == "-":  # unary minus
            self.eat("arith")
            inner = self.atom()
            if isinstance(inner, (int, float)):
                return -inner
            return {"op": "*", "args": [-1, inner]}
        if k == "lpar":  # parenthesized arithmetic sub-expression
            self.eat("lpar")
            node = self.additive()
            self.eat("rpar")
            return node
        if k == "str":
            self.eat("str")
            return v[1:-1].replace("''", "'")
        if k == "num":
            self.eat("num")
            return float(v) if ("." in v or "e" in v.lower()) else int(v)
        if k == "word":
            if v.upper() in ("TRUE", "FALSE"):
                self.eat("word")
                return v.upper() == "TRUE"
            if v.upper() in ("CASEI", "ACCENTI"):  # insensitivity wrappers
                name = v.upper().lower()
                self.eat("word")
                self.eat("lpar")
                inner = self.operand()
                self.eat("rpar")
                return {"op": name, "args": [inner]}
            self.eat("word")
            return {"property": v}
        raise ValueError(f"bad operand {k}:{v}")

    _SPATIAL_OPS = (
        "S_INTERSECTS", "S_CONTAINS", "S_WITHIN", "S_DISJOINT", "S_EQUALS",
        "S_OVERLAPS", "S_TOUCHES", "S_CROSSES",
    )
    _TEMPORAL_OPS = (
        "T_INTERSECTS", "T_DURING", "ANYINTERACTS", "T_BEFORE", "T_AFTER",
        "T_MEETS", "T_METBY", "T_OVERLAPS", "T_OVERLAPPEDBY", "T_STARTS",
        "T_STARTEDBY", "T_FINISHES", "T_FINISHEDBY", "T_CONTAINS",
        "T_EQUALS", "T_DISJOINT",
    )

    def predicate(self):
        k, v = self.peek()
        if k == "word" and v.upper() in self._SPATIAL_OPS:
            name = v.upper().lower()
            self.eat("word")
            self.eat("lpar")
            a = self.operand()
            self.eat("comma")
            geom = self.geom_literal()
            self.eat("rpar")
            return {"op": name, "args": [a, geom]}
        if k == "word" and v.upper() in self._TEMPORAL_OPS:
            name = v.upper()
            self.eat("word")
            self.eat("lpar")
            a = self.operand()
            self.eat("comma")
            iv = self.interval_literal()
            self.eat("rpar")
            return {"op": "t_intersects" if name == "ANYINTERACTS" else name.lower(),
                    "args": [a, iv]}
        if k == "word" and v.upper() in (
            "A_EQUALS", "A_CONTAINS", "A_CONTAINEDBY", "A_OVERLAPS",
        ):
            name = v.lower()
            self.eat("word")
            self.eat("lpar")
            a = self.array_operand()
            self.eat("comma")
            b = self.array_operand()
            self.eat("rpar")
            return {"op": name, "args": [a, b]}
        left = self.operand()
        k, v = self.peek()
        if k == "op":
            self.eat("op")
            return {"op": {"<>": "<>"}.get(v, v), "args": [left, self.operand()]}
        if k == "word" and v.upper() == "IS":
            self.eat("word")
            neg = False
            if self.peek()[1].upper() == "NOT":
                self.eat("word")
                neg = True
            self.eat("word", "NULL")
            node = {"op": "isNull", "args": [left]}
            return {"op": "not", "args": [node]} if neg else node
        if k == "word" and v.upper() == "IN":
            self.eat("word")
            self.eat("lpar")
            vals = [self.operand()]
            while self.peek()[0] == "comma":
                self.eat("comma")
                vals.append(self.operand())
            self.eat("rpar")
            return {"op": "in", "args": [left, vals]}
        if k == "word" and v.upper() == "LIKE":
            self.eat("word")
            return {"op": "like", "args": [left, self.operand()]}
        if k == "word" and v.upper() == "BETWEEN":
            self.eat("word")
            lo = self.operand()
            self.eat("word", "AND")
            hi = self.operand()
            return {"op": "between", "args": [left, lo, hi]}
        if k == "word" and v.upper() == "NOT":
            # A NOT BETWEEN/LIKE/IN ...
            self.eat("word")
            inner = self.predicate_tail(left)
            return {"op": "not", "args": [inner]}
        raise ValueError(f"bad predicate near {k}:{v}")

    def predicate_tail(self, left):
        k, v = self.peek()
        if k == "word" and v.upper() == "BETWEEN":
            self.eat("word")
            lo = self.operand()
            self.eat("word", "AND")
            hi = self.operand()
            return {"op": "between", "args": [left, lo, hi]}
        if k == "word" and v.upper() == "LIKE":
            self.eat("word")
            return {"op": "like", "args": [left, self.operand()]}
        if k == "word" and v.upper() == "IN":
            self.eat("word")
            self.eat("lpar")
            vals = [self.operand()]
            while self.peek()[0] == "comma":
                self.eat("comma")
                vals.append(self.operand())
            self.eat("rpar")
            return {"op": "in", "args": [left, vals]}
        raise ValueError(f"bad NOT-predicate near {k}:{v}")

    def array_operand(self):
        """('a', 'b', ...) array literal, or a property/scalar operand."""
        if self.peek()[0] == "lpar":
            self.eat("lpar")
            vals = [self.operand()]
            while self.peek()[0] == "comma":
                self.eat("comma")
                vals.append(self.operand())
            self.eat("rpar")
            return {"array": vals}
        return self.operand()

    def interval_literal(self):
        """INTERVAL('start','end') with '..' for open ends (cql2 temporal)."""
        self.eat("word", "INTERVAL")
        self.eat("lpar")
        a = self.operand()
        self.eat("comma")
        b = self.operand()
        self.eat("rpar")
        return {"interval": [a, b]}

    def geom_literal(self):
        # accept GeoJSON-ish inline: we only need it from json filters or
        # WKT-like POINT(x y) / POLYGON((...)) / BBOX(x0,y0,x1,y1)
        k, v = self.peek()
        if k == "word" and v.upper() == "POINT":
            self.eat("word")
            self.eat("lpar")
            x = self._coord()
            y = self._coord()
            self.eat("rpar")
            return {"type": "Point", "coordinates": [x, y]}
        if k == "word" and v.upper() == "BBOX":
            self.eat("word")
            self.eat("lpar")
            vals = [self._coord()]
            while self.peek()[0] == "comma":
                self.eat("comma")
                vals.append(self._coord())
            self.eat("rpar")
            x0, y0, x1, y1 = vals
            return {
                "type": "Polygon",
                "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
            }
        if k == "word" and v.upper() == "LINESTRING":
            self.eat("word")
            return {"type": "LineString", "coordinates": self._pos_list()}
        if k == "word" and v.upper() == "MULTIPOINT":
            self.eat("word")
            self.eat("lpar")
            pts = []
            while True:
                if self.peek()[0] == "lpar":  # both (x y),(x y) and x y, x y
                    self.eat("lpar")
                    pts.append([self._coord(), self._coord()])
                    self.eat("rpar")
                else:
                    pts.append([self._coord(), self._coord()])
                if self.peek()[0] == "comma":
                    self.eat("comma")
                else:
                    break
            self.eat("rpar")
            return {"type": "MultiPoint", "coordinates": pts}
        if k == "word" and v.upper() == "MULTILINESTRING":
            self.eat("word")
            self.eat("lpar")
            lines = [self._pos_list()]
            while self.peek()[0] == "comma":
                self.eat("comma")
                lines.append(self._pos_list())
            self.eat("rpar")
            return {"type": "MultiLineString", "coordinates": lines}
        if k == "word" and v.upper() == "POLYGON":
            self.eat("word")
            return {"type": "Polygon", "coordinates": self._ring_list()}
        if k == "word" and v.upper() == "MULTIPOLYGON":
            self.eat("word")
            self.eat("lpar")
            polys = [self._ring_list()]
            while self.peek()[0] == "comma":
                self.eat("comma")
                polys.append(self._ring_list())
            self.eat("rpar")
            return {"type": "MultiPolygon", "coordinates": polys}
        raise ValueError(f"unsupported geometry literal near {v}")

    def _coord(self):
        """One signed numeric WKT ordinate. Coordinates must NOT go through
        operand(): the arithmetic grammar would consume 'x -y' (space-
        separated ordinate pair with negative y) as binary subtraction."""
        neg = False
        if self.peek() == ("arith", "-"):
            self.eat("arith")
            neg = True
        k, v = self.peek()
        if k != "num":
            raise ValueError(f"expected WKT coordinate, got {k}:{v}")
        self.eat("num")
        val = float(v) if ("." in v or "e" in v.lower()) else int(v)
        return -val if neg else val

    def _pos_list(self) -> list:
        """( x y, x y, ... ) — one parenthesized coordinate sequence."""
        self.eat("lpar")
        pts = [[self._coord(), self._coord()]]
        while self.peek()[0] == "comma":
            self.eat("comma")
            pts.append([self._coord(), self._coord()])
        self.eat("rpar")
        return pts

    def _ring_list(self) -> list:
        """( ( x y, ... ), ( x y, ... ) ) — one polygon's ring sequence."""
        self.eat("lpar")
        rings = [self._pos_list()]
        while self.peek()[0] == "comma":
            self.eat("comma")
            rings.append(self._pos_list())
        self.eat("rpar")
        return rings


def parse_cql2(filter_expr: str | dict) -> dict:
    """cql2-text string or cql2-json dict → AST dict (cql2-json shaped)."""
    if isinstance(filter_expr, dict):
        return filter_expr
    s = filter_expr.strip()
    if s.startswith("{"):
        return json.loads(s)
    return _TextParser(s).parse()


# --------------------------------------------------------------- evaluator --


def _collect_properties(node, out: set[str]):
    if isinstance(node, dict):
        if "property" in node:
            out.add(node["property"])
        for a in node.get("args", []):
            _collect_properties(a, out)
        for a in node.get("array", []):
            _collect_properties(a, out)
    elif isinstance(node, list):
        for a in node:
            _collect_properties(a, out)


def _strip_accents(s: str) -> str:
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn"
    )


class Cql2Predicate:
    """Compiled filter: ``mask(batch) -> np.ndarray[bool]`` over Arrow batches.

    ``check_schema(names)`` raises UnknownPropertyError when a referenced
    property is missing (reference short-circuit,
    crates/duckdb/src/client.rs:391-393).
    """

    def __init__(self, filter_expr: str | dict, geometry_column: str = "geometry"):
        self.ast = parse_cql2(filter_expr)
        self.geometry_column = geometry_column
        props: set[str] = set()
        _collect_properties(self.ast, props)
        self.properties = props

    def check_schema(self, column_names) -> None:
        missing = {
            p for p in self.properties if p not in column_names and p != "geometry"
        }
        if missing:
            raise UnknownPropertyError(sorted(missing))

    def mask(self, batch: pa.Table) -> np.ndarray:
        return np.asarray(self._eval(self.ast, batch), dtype=bool)

    def _value(self, node, batch: pa.Table):
        if isinstance(node, dict) and "property" in node:
            return batch[node["property"]]
        if isinstance(node, dict) and "timestamp" in node:
            return np.datetime64(node["timestamp"].rstrip("Z"), "ms")
        if isinstance(node, dict) and node.get("op") == "casei":
            inner = self._value(node["args"][0], batch)
            if isinstance(inner, str):
                return inner.lower()
            return pc.utf8_lower(inner)
        if isinstance(node, dict) and node.get("op") == "accenti":
            inner = self._value(node["args"][0], batch)
            if isinstance(inner, str):
                return _strip_accents(inner)
            vals = inner.to_pylist() if hasattr(inner, "to_pylist") else list(inner)
            return pa.array(
                [None if v is None else _strip_accents(str(v)) for v in vals],
                pa.string(),
            )
        if isinstance(node, dict) and node.get("op") in ("+", "-", "*", "/", "%", "^"):
            # numpy arithmetic: float '/' and true '%'/'^' match the SQL
            # oracle's numeric promotion (pc.divide would int-divide)
            op = node["op"]
            a = self._to_numeric(self._value(node["args"][0], batch))
            b = self._to_numeric(self._value(node["args"][1], batch))
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                return np.true_divide(a, b)
            if op == "%":
                return np.fmod(a, b)  # dividend sign, matching SQL %
            return np.power(a, b)
        return node

    @staticmethod
    def _to_numeric(v):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return v.to_numpy(zero_copy_only=False)
        return v

    def _eval(self, node, batch: pa.Table) -> np.ndarray:
        op = node["op"]
        args = node.get("args", [])
        n = len(batch)
        if op in ("and", "or"):
            vals = [self._eval(a, batch) for a in args]
            res = vals[0]
            for v in vals[1:]:
                res = (res & v) if op == "and" else (res | v)
            return res
        if op == "not":
            return ~self._eval(args[0], batch)
        if op == "isNull":
            col = self._value(args[0], batch)
            return pc.is_null(col).to_numpy(zero_copy_only=False)
        if op == "in":
            col = self._value(args[0], batch)
            vals = [self._value(v, batch) for v in args[1]]
            return pc.is_in(col, value_set=pa.array(vals)).to_numpy(zero_copy_only=False)
        if op == "like":
            col = self._value(args[0], batch)
            pat = str(args[1]).replace("%", "*").replace("_", "?")
            return pc.match_like(col, str(args[1])).to_numpy(zero_copy_only=False) if hasattr(pc, "match_like") else pc.match_substring_regex(
                col, "^" + re.escape(str(args[1])).replace("%", ".*").replace("_", ".") + "$"
            ).to_numpy(zero_copy_only=False)
        if op == "s_intersects":
            from .geo.pip import PreparedGeometry
            from .geo.wkb import decode_bboxes

            geom = args[1]
            pg = PreparedGeometry(geom)
            col = batch[self.geometry_column]
            wkbs = col.to_pylist()
            out = np.zeros(n, dtype=bool)
            valid = [i for i, b in enumerate(wkbs) if b is not None]
            if valid:
                bbs = decode_bboxes([wkbs[i] for i in valid])
                # exact only on bbox-overlap survivors
                cand = (
                    (bbs[:, 0] <= pg.xmax) & (bbs[:, 2] >= pg.xmin)
                    & (bbs[:, 1] <= pg.ymax) & (bbs[:, 3] >= pg.ymin)
                )
                for j in np.nonzero(cand)[0]:
                    out[valid[j]] = _geom_intersects(pg, wkbs[valid[j]])
            return out
        if op == "s_disjoint":
            # general: exact complement of s_intersects; null geometry rows
            # stay False (a missing geometry relates to nothing)
            col = batch[self.geometry_column]
            notnull = pc.is_valid(col).to_numpy(zero_copy_only=False)
            inner = self._eval({"op": "s_intersects", "args": args}, batch)
            return ~inner & notnull
        if op in ("s_contains", "s_within", "s_equals", "s_overlaps",
                  "s_touches", "s_crosses"):
            return _relate_column(op, batch[self.geometry_column].to_pylist(),
                                  args[1], n)
        if op in _T_RELATIONS:
            # item interval = [coalesce(start_datetime, col), coalesce(end_datetime, col)]
            # vs the literal interval. t_intersects / t_during keep the
            # inclusive reference-P5 semantics (duckdb client.rs:361-385);
            # the remaining relations are the strict Allen definitions the
            # reference inherits from the cql2 crate (api/filter.rs). Open
            # '..' ends are ±inf — equality relations against an open end
            # are False by construction.
            from .query import normalize_datetime

            iv = args[1]["interval"]
            q_start = None if iv[0] in ("..", "") else normalize_datetime(str(iv[0]))[0]
            q_end = None if iv[1] in ("..", "") else normalize_datetime(str(iv[1]))[1]
            colname = args[0].get("property", "datetime") if isinstance(args[0], dict) else "datetime"
            dt = batch[colname].to_numpy(zero_copy_only=False)
            names = batch.column_names
            sdt = (
                batch["start_datetime"].to_numpy(zero_copy_only=False)
                if "start_datetime" in names else np.full(n, np.datetime64("NaT"))
            )
            edt = (
                batch["end_datetime"].to_numpy(zero_copy_only=False)
                if "end_datetime" in names else np.full(n, np.datetime64("NaT"))
            )
            istart = np.where(np.isnat(sdt), dt, sdt)
            iend = np.where(np.isnat(edt), dt, edt)
            ok = ~np.isnat(istart) | ~np.isnat(iend)
            if op == "t_intersects":
                if q_start is not None:
                    ok &= iend >= q_start
                if q_end is not None:
                    ok &= istart <= q_end
                return ok
            if op == "t_during":  # contained in the literal interval
                if q_start is not None:
                    ok &= istart >= q_start
                if q_end is not None:
                    ok &= iend <= q_end
                return ok
            # strict Allen relations on float epoch-ms (NaT → NaN → False)
            s = istart.astype("datetime64[ms]").astype(np.int64).astype(np.float64)
            e = iend.astype("datetime64[ms]").astype(np.int64).astype(np.float64)
            nat = np.isnat(istart) | np.isnat(iend)
            s[nat] = np.nan
            e[nat] = np.nan
            S = (-np.inf if q_start is None
                 else float(np.datetime64(q_start, "ms").astype(np.int64)))
            E = (np.inf if q_end is None
                 else float(np.datetime64(q_end, "ms").astype(np.int64)))
            rel = {
                "t_before": lambda: e < S,
                "t_after": lambda: s > E,
                "t_meets": lambda: e == S,
                "t_metby": lambda: s == E,
                "t_overlaps": lambda: (s < S) & (S < e) & (e < E),
                "t_overlappedby": lambda: (S < s) & (s < E) & (E < e),
                "t_starts": lambda: (s == S) & (e < E),
                "t_startedby": lambda: (s == S) & (e > E),
                "t_finishes": lambda: (e == E) & (s > S),
                "t_finishedby": lambda: (e == E) & (s < S),
                "t_contains": lambda: (s < S) & (e > E),
                "t_equals": lambda: (s == S) & (e == E),
                "t_disjoint": lambda: (e < S) | (s > E),
            }[op]()
            return rel & ok & ~nat
        if op == "between":
            col = self._value(args[0], batch)
            lo = self._value(args[1], batch)
            hi = self._value(args[2], batch)
            res = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
            return pc.fill_null(res, False).to_numpy(zero_copy_only=False)
        if op in ("a_equals", "a_contains", "a_containedby", "a_overlaps"):
            # array predicates (OGC CQL2 array functions, set semantics);
            # reference routes these to the full cql2 crate (api/filter.rs)
            def as_lists(x):
                if isinstance(x, dict) and "array" in x:
                    lit = [self._value(v, batch) for v in x["array"]]
                    return None, set(lit)
                col = self._value(x, batch)
                return col.to_pylist(), None

            rows_a, lit_a = as_lists(args[0])
            rows_b, lit_b = as_lists(args[1])
            out = np.zeros(n, dtype=bool)
            for i in range(n):
                # null array on either side → row fails (checked BEFORE
                # set() construction: set(None) would raise)
                if (rows_a is not None and rows_a[i] is None) or (
                    rows_b is not None and rows_b[i] is None
                ):
                    continue
                va = set(rows_a[i]) if rows_a is not None else lit_a
                vb = set(rows_b[i]) if rows_b is not None else lit_b
                if op == "a_equals":
                    out[i] = va == vb
                elif op == "a_contains":
                    out[i] = va >= vb
                elif op == "a_containedby":
                    out[i] = va <= vb
                else:
                    out[i] = bool(va & vb)
            return out
        # comparison ops
        left = self._value(args[0], batch)
        right = self._value(args[1], batch)
        fn = {"=": pc.equal, "<>": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
              ">": pc.greater, ">=": pc.greater_equal}[op]
        if isinstance(left, dict) and "op" in left:
            left = self._eval(left, batch)
        if isinstance(right, dict) and "op" in right:
            right = self._eval(right, batch)
        res = fn(left, right)
        return pc.fill_null(res, False).to_numpy(zero_copy_only=False)


def _geom_intersects(pg, wkb_or_geom) -> bool:
    """Exact test of one stored geometry (WKB bytes or GeoJSON dict)
    against a prepared query geometry. Covers all GeoJSON types (the
    reference decodes the full geoarrow set, core geoarrow/json.rs:466-499)."""
    from .geo.pip import _seg_cross
    from .geo.wkb import decode_geometry

    g = (
        decode_geometry(bytes(wkb_or_geom))
        if isinstance(wkb_or_geom, (bytes, bytearray, memoryview))
        else wkb_or_geom
    )
    t = g["type"]
    if t == "Point":
        x, y = g["coordinates"][:2]
        return bool(pg.contains_points(np.array([x]), np.array([y]))[0])
    if t == "MultiPoint":
        pts = np.asarray([c[:2] for c in g["coordinates"]], dtype=np.float64)
        return bool(pg.contains_points(pts[:, 0], pts[:, 1]).any())
    if t == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in g["coordinates"]]
        return pg.intersects_polygon(rings)
    if t == "MultiPolygon":
        return any(
            pg.intersects_polygon([np.asarray(r, dtype=np.float64) for r in poly])
            for poly in g["coordinates"]
        )
    if t in ("LineString", "MultiLineString"):
        if pg.kind == "collection":
            return any(_geom_intersects(s, g) for s in pg.subs)
        lines = [g["coordinates"]] if t == "LineString" else g["coordinates"]
        for line in lines:
            r = np.asarray(line, dtype=np.float64)
            if pg.contains_points(r[:, 0], r[:, 1]).any():
                return True
            if pg.kind == "point":
                # point-kind contains_points only tests vertex equality —
                # check the query point against each segment's INTERIOR too
                px, py = float(pg.point[0]), float(pg.point[1])
                a, b = r[:-1], r[1:]
                cross = (b[:, 0] - a[:, 0]) * (py - a[:, 1]) - (
                    b[:, 1] - a[:, 1]
                ) * (px - a[:, 0])
                on_line = np.abs(cross) < 1e-9
                within = (
                    (px >= np.minimum(a[:, 0], b[:, 0]) - 1e-12)
                    & (px <= np.maximum(a[:, 0], b[:, 0]) + 1e-12)
                    & (py >= np.minimum(a[:, 1], b[:, 1]) - 1e-12)
                    & (py <= np.maximum(a[:, 1], b[:, 1]) + 1e-12)
                )
                if (on_line & within).any():
                    return True
                continue
            a, b = r[:-1], r[1:]
            if _seg_cross(
                a[:, 0][:, None], a[:, 1][:, None], b[:, 0][:, None], b[:, 1][:, None],
                pg.ax[None, :], pg.ay[None, :], pg.bx[None, :], pg.by[None, :],
            ).any():
                return True
        return False
    if t == "GeometryCollection":
        return any(_geom_intersects(pg, sub) for sub in g["geometries"])
    raise ValueError(f"s_intersects: unsupported stored geometry {t}")


# temporal relation op names handled by the Evaluator (CQL2 standard set;
# reference delegates to the cql2 crate, crates/core/src/api/filter.rs)
_T_RELATIONS = frozenset(
    {"t_intersects", "t_during", "t_before", "t_after", "t_meets", "t_metby",
     "t_overlaps", "t_overlappedby", "t_starts", "t_startedby", "t_finishes",
     "t_finishedby", "t_contains", "t_equals", "t_disjoint"}
)


def _query_rect(qgeom: dict):
    """Query geometry → (x0, y0, x1, y1) if it is a Point or an
    axis-aligned rectangle Polygon/BBOX; None otherwise."""
    t = qgeom["type"]
    if t == "Point":
        x, y = qgeom["coordinates"][:2]
        return float(x), float(y), float(x), float(y)
    if t == "Polygon" and len(qgeom["coordinates"]) == 1:
        r = np.asarray(qgeom["coordinates"][0], dtype=np.float64)
        xs, ys = np.unique(r[:, 0]), np.unique(r[:, 1])
        if len(xs) == 2 and len(ys) == 2 and len(r) == 5:
            return float(xs[0]), float(ys[0]), float(xs[1]), float(ys[1])
    return None


def _relate_column(op: str, wkbs, qgeom: dict, n: int) -> np.ndarray:
    """Column dispatch for the S_* relations: decode each stored geometry
    once, take the vectorized interval fast path when EVERY stored
    geometry is an axis-aligned rect AND the query literal is one the
    rect evaluator supports; otherwise run the general boundary-
    subdivision relate (geo/relate.py) on the bbox-plausible candidates
    only — the bbox prefilter is a NECESSARY condition of each relation,
    so pruned rows are exact Falses, and the per-row exact relate (the
    inherent cost of DE-9IM over arbitrary polygons) touches just the
    survivors."""
    from .geo.relate import eval_relation
    from .geo.wkb import _all_coords, decode_geometry

    geoms: list = [None] * n
    bbs = np.full((n, 4), np.nan)
    valid = np.zeros(n, bool)
    rect = np.zeros(n, bool)
    for i, b in enumerate(wkbs):
        if b is None:
            continue
        g = decode_geometry(bytes(b))
        geoms[i] = g
        valid[i] = True
        c = _all_coords(g)
        bbs[i] = (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
        if g["type"] == "Polygon" and len(g["coordinates"]) == 1:
            r = np.asarray(g["coordinates"][0], dtype=np.float64)
            xs, ys = np.unique(r[:, 0]), np.unique(r[:, 1])
            rect[i] = len(xs) == 2 and len(ys) == 2
    if rect[valid].all() if valid.any() else True:
        try:
            return _rect_relate_bbs(op, bbs, valid, qgeom, n)
        except NotImplementedError:
            pass  # query literal outside the rect evaluator → general
    # ---- general path: bbox prefilter (necessary condition per op) ----
    qc = _geom_coords_bbox(qgeom)
    qx0, qy0, qx1, qy1 = qc
    x0, y0, x1, y1 = bbs[:, 0], bbs[:, 1], bbs[:, 2], bbs[:, 3]
    with np.errstate(invalid="ignore"):
        if op == "s_contains":
            cand = (x0 <= qx0) & (y0 <= qy0) & (x1 >= qx1) & (y1 >= qy1)
        elif op == "s_within":
            cand = (x0 >= qx0) & (y0 >= qy0) & (x1 <= qx1) & (y1 <= qy1)
        elif op == "s_equals":
            cand = (x0 == qx0) & (y0 == qy0) & (x1 == qx1) & (y1 == qy1)
        else:  # overlaps / touches / crosses: closed bbox overlap
            cand = (x0 <= qx1) & (x1 >= qx0) & (y0 <= qy1) & (y1 >= qy0)
    cand &= valid
    out = np.zeros(n, bool)
    for i in np.flatnonzero(cand):
        out[i] = eval_relation(op, geoms[i], qgeom)
    return out


def _geom_coords_bbox(geom: dict) -> tuple:
    from .geo.wkb import _all_coords

    c = _all_coords(geom)
    return (
        float(c[:, 0].min()), float(c[:, 1].min()),
        float(c[:, 0].max()), float(c[:, 1].max()),
    )


def _stored_rects(wkbs, n: int):
    """Stored WKB column → ((n,4) bboxes, valid mask). Raises if any
    non-null stored geometry is not an axis-aligned rectangle — callers
    route non-rect columns to the general relate via
    :func:`_relate_column` (geo/relate.py); this strict variant remains
    for the vectorized rect fast path."""
    from .geo.wkb import _all_coords, decode_geometry

    bbs = np.full((n, 4), np.nan)
    valid = np.zeros(n, bool)
    for i, b in enumerate(wkbs):
        if b is None:
            continue
        g = decode_geometry(bytes(b))
        if g["type"] != "Polygon" or len(g["coordinates"]) != 1:
            raise NotImplementedError(
                f"S_* relate: stored geometry {g['type']} is not a rect footprint"
            )
        r = np.asarray(g["coordinates"][0], dtype=np.float64)
        xs, ys = np.unique(r[:, 0]), np.unique(r[:, 1])
        if len(xs) != 2 or len(ys) != 2:
            raise NotImplementedError(
                "S_* relate: stored polygon is not axis-aligned rectangular"
            )
        bbs[i] = (xs[0], ys[0], xs[1], ys[1])
        valid[i] = True
    return bbs, valid


def _segments_hit_open_rects(coords: np.ndarray, x0, y0, x1, y1) -> np.ndarray:
    """(m,2) polyline vertices vs (n,) rect arrays → (n,) bool: does any
    segment pass through the OPEN rect interior (Liang-Barsky slab clip;
    point-grazing at a corner and runs along an edge are excluded)."""
    n = len(x0)
    hit = np.zeros(n, bool)
    a, b = coords[:-1], coords[1:]
    for (ax, ay), (bx, by) in zip(a, b):
        dx, dy = bx - ax, by - ay
        if dx == 0 and dy == 0:
            hit |= (x0 < ax) & (ax < x1) & (y0 < ay) & (ay < y1)
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            if dx != 0:
                txa = (x0 - ax) / dx
                txb = (x1 - ax) / dx
                tx_lo, tx_hi = np.minimum(txa, txb), np.maximum(txa, txb)
            else:
                inside_x = (x0 < ax) & (ax < x1)
                tx_lo = np.where(inside_x, -np.inf, np.inf)
                tx_hi = np.where(inside_x, np.inf, -np.inf)
            if dy != 0:
                tya = (y0 - ay) / dy
                tyb = (y1 - ay) / dy
                ty_lo, ty_hi = np.minimum(tya, tyb), np.maximum(tya, tyb)
            else:
                inside_y = (y0 < ay) & (ay < y1)
                ty_lo = np.where(inside_y, -np.inf, np.inf)
                ty_hi = np.where(inside_y, np.inf, -np.inf)
        t_in = np.maximum(np.maximum(tx_lo, ty_lo), 0.0)
        t_out = np.minimum(np.minimum(tx_hi, ty_hi), 1.0)
        hit |= t_in < t_out
    return hit


def _rect_relate(op: str, wkbs, qgeom: dict, n: int) -> np.ndarray:
    """Exact OGC-SFA relations for rect stored footprints vs a Point /
    axis-aligned-rect / LineString query literal (vectorized interval
    logic; crosses uses a per-segment open-rect clip). Reference compiles
    these CQL2 ops to DuckDB spatial SQL (crates/duckdb/src/client.rs:
    386-394 ToDuckSQL); the engine evaluates them natively."""
    bbs, valid = _stored_rects(wkbs, n)
    return _rect_relate_bbs(op, bbs, valid, qgeom, n)


def _rect_relate_bbs(
    op: str, bbs: np.ndarray, valid: np.ndarray, qgeom: dict, n: int
) -> np.ndarray:
    """Rect fast path over precomputed (n,4) bboxes + valid mask.
    Raises NotImplementedError for query literals it cannot express —
    callers fall through to the general relate."""
    x0, y0, x1, y1 = bbs[:, 0], bbs[:, 1], bbs[:, 2], bbs[:, 3]
    out = np.zeros(n, bool)
    t = qgeom["type"]

    if op == "s_crosses":
        # area/area and area/point crosses is False by definition (SFA:
        # defined only for mixed-dimension pairs); rect × line is real
        if t not in ("LineString", "MultiLineString"):
            return out
        lines = ([qgeom["coordinates"]] if t == "LineString"
                 else qgeom["coordinates"])
        interior = np.zeros(n, bool)
        all_closed = np.ones(n, bool)
        for line in lines:
            coords = np.asarray(line, dtype=np.float64)
            interior |= _segments_hit_open_rects(coords, x0, y0, x1, y1)
            for vx, vy in coords:
                all_closed &= (x0 <= vx) & (vx <= x1) & (y0 <= vy) & (vy <= y1)
        # crosses(A, L): L meets A's interior AND L meets A's exterior
        # (rect is convex, so "not all vertices within the closure" ⟺
        # some part of L lies outside)
        with np.errstate(invalid="ignore"):
            res = interior & ~all_closed
        return res & valid

    if op == "s_contains" and t in ("LineString", "MultiLineString"):
        lines = ([qgeom["coordinates"]] if t == "LineString"
                 else qgeom["coordinates"])
        interior = np.zeros(n, bool)
        all_closed = np.ones(n, bool)
        for line in lines:
            coords = np.asarray(line, dtype=np.float64)
            interior |= _segments_hit_open_rects(coords, x0, y0, x1, y1)
            for vx, vy in coords:
                all_closed &= (x0 <= vx) & (vx <= x1) & (y0 <= vy) & (vy <= y1)
        with np.errstate(invalid="ignore"):
            res = interior & all_closed
        return res & valid

    q = _query_rect(qgeom)
    if q is None:
        raise NotImplementedError(
            f"S_* relate: query geometry {t} unsupported for {op} "
            "(Point, BBOX/axis-aligned Polygon, LineStrings for "
            "s_crosses/s_contains)"
        )
    qx0, qy0, qx1, qy1 = q
    with np.errstate(invalid="ignore"):
        ix = np.minimum(x1, qx1) - np.maximum(x0, qx0)
        iy = np.minimum(y1, qy1) - np.maximum(y0, qy0)
        closed = (ix >= 0) & (iy >= 0)
        open_ = (ix > 0) & (iy > 0)
        covers_q = (x0 <= qx0) & (qx1 <= x1) & (y0 <= qy0) & (qy1 <= y1)
        covered_by_q = (qx0 <= x0) & (x1 <= qx1) & (qy0 <= y0) & (y1 <= qy1)
        if op == "s_contains":
            if qx0 == qx1 and qy0 == qy1:  # point: strict interior
                res = (x0 < qx0) & (qx0 < x1) & (y0 < qy0) & (qy0 < y1)
            else:
                res = covers_q & open_
        elif op == "s_within":
            res = covered_by_q & open_
        elif op == "s_equals":
            res = (x0 == qx0) & (y0 == qy0) & (x1 == qx1) & (y1 == qy1)
        elif op == "s_overlaps":
            # same-dimension only: a Point query never overlaps an area
            if qx0 == qx1 or qy0 == qy1:
                return out
            res = open_ & ~covers_q & ~covered_by_q
        elif op == "s_touches":
            if qx0 == qx1 or qy0 == qy1:
                # degenerate (point / zero-width segment) literal: the
                # interval logic collapses (ix or iy is 0 even when the
                # literal passes through the INTERIOR, which open_ reads
                # as non-overlapping) — touches ⟺ meets the closure but
                # never the open interior
                meets_int = (
                    (np.minimum(x1, qx1) > np.maximum(x0, qx0))
                    if qx0 != qx1
                    else (x0 < qx0) & (qx0 < x1)
                ) & (
                    (np.minimum(y1, qy1) > np.maximum(y0, qy0))
                    if qy0 != qy1
                    else (y0 < qy0) & (qy0 < y1)
                )
                res = closed & ~meets_int
            else:
                res = closed & ~open_
        else:  # pragma: no cover
            raise ValueError(op)
    return res & valid


# --------------------------------------------- scan-level filter pushdown --


def _arrow_scalar_ok(v, field_type: "pa.DataType | None") -> bool:
    """May literal ``v`` be compared against a column of ``field_type``
    in a dataset expression without a runtime cast error? With no schema
    the answer is optimistic for plain scalars."""
    if not isinstance(v, (int, float, str, bool)):
        return False
    if field_type is None:
        return True
    if isinstance(v, bool):
        return pa.types.is_boolean(field_type)
    if isinstance(v, (int, float)):
        return (
            pa.types.is_integer(field_type)
            or pa.types.is_floating(field_type)
            or pa.types.is_decimal(field_type)
        )
    return pa.types.is_string(field_type) or pa.types.is_large_string(field_type)


def to_arrow_filter(filter_expr: "str | dict", schema: "pa.Schema | None" = None):
    """Compile the SARGABLE part of a CQL2 filter into a pyarrow dataset
    expression usable as ``read_parquet(filter=...)`` — the scan-level half
    of the reference's full-SQL pushdown (crates/duckdb/src/client.rs:386-394
    compiles the entire filter to DuckDB; here parquet row-group statistics
    do the pruning and the FULL predicate re-runs post-read).

    CONSERVATIVE-PREFILTER CONTRACT: the returned expression is IMPLIED by
    the engine's predicate — it never drops a row ``Cql2Predicate.mask``
    would keep — so callers may apply it at the scan and re-apply the full
    filter unchanged. Returns None when nothing sargable compiles. Null
    semantics line up because the engine's comparisons are
    ``fill_null(False)`` (cql2.py ``_eval`` tail), matching the scan's
    null-drops; NOT is therefore never compiled (engine ``NOT(null→False)``
    KEEPS null rows) except for ``NOT(IS NULL)`` → ``is_valid``.

    Compiled: property-vs-scalar comparisons (= <> < <= > >=, either
    side), IN over scalar literals, BETWEEN with scalar bounds, IS [NOT]
    NULL, LIKE over string columns (same pc.match_like kernel the engine
    uses — no stat pruning but rows drop inside the scan), AND (any
    compilable subset), OR (only when EVERY arm compiles). Skipped
    (evaluated post-read as always): CASEI/ACCENTI, arithmetic, arrays,
    spatial S_*, temporal T_*.
    """
    import pyarrow.dataset  # noqa: F401  (registers expression kernels)

    ast = parse_cql2(filter_expr)

    def ftype(name: str):
        if schema is None:
            return None
        idx = schema.get_field_index(name)
        return schema.field(idx).type if idx != -1 else None

    def prop_name(node):
        return node["property"] if isinstance(node, dict) and set(node) == {"property"} else None

    def compile_node(node):
        if not isinstance(node, dict):
            return None
        op = node.get("op")
        args = node.get("args", [])
        if op == "and":
            parts = [e for e in (compile_node(a) for a in args) if e is not None]
            if not parts:
                return None
            expr = parts[0]
            for p in parts[1:]:
                expr = expr & p
            return expr
        if op == "or":
            parts = [compile_node(a) for a in args]
            if any(p is None for p in parts):
                return None
            expr = parts[0]
            for p in parts[1:]:
                expr = expr | p
            return expr
        if op == "not":
            inner = args[0]
            if isinstance(inner, dict) and inner.get("op") == "isNull":
                p = prop_name(inner["args"][0])
                if p is not None and (schema is None or ftype(p) is not None):
                    return pc.field(p).is_valid()
            return None
        if op == "isNull":
            p = prop_name(args[0])
            if p is not None and (schema is None or ftype(p) is not None):
                return pc.field(p).is_null()
            return None
        if op == "in":
            p = prop_name(args[0])
            vals = args[1]
            if p is None or (schema is not None and ftype(p) is None):
                return None
            if not all(_arrow_scalar_ok(v, ftype(p)) for v in vals):
                return None
            return pc.field(p).isin(vals)
        if op == "between":
            p = prop_name(args[0])
            lo, hi = args[1], args[2]
            if p is None or (schema is not None and ftype(p) is None):
                return None
            if not (_arrow_scalar_ok(lo, ftype(p)) and _arrow_scalar_ok(hi, ftype(p))):
                return None
            return (pc.field(p) >= lo) & (pc.field(p) <= hi)
        if op == "like":
            # engine LIKE uses pc.match_like with fill_null(False) — the
            # identical kernel as a scan expression drops null rows, so
            # semantics match exactly (no row-group stat pruning for LIKE,
            # but rows drop during the scan, before entering Ray blocks)
            p = prop_name(args[0])
            pat = args[1]
            if p is None or not isinstance(pat, str) or not hasattr(pc, "match_like"):
                return None
            t = ftype(p)
            if schema is not None and t is None:
                return None
            if t is not None and not (
                pa.types.is_string(t) or pa.types.is_large_string(t)
            ):
                return None
            return pc.match_like(pc.field(p), pat)
        if op in ("=", "<>", "<", "<=", ">", ">="):
            a, b = args
            pa_, pb = prop_name(a), prop_name(b)
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "<>": "<>"}
            if pa_ is None and pb is not None:  # literal OP property → flip
                a, b, pa_ = b, a, pb
                op = flip[op]
            if pa_ is None or isinstance(b, dict):
                return None
            if schema is not None and ftype(pa_) is None:
                return None
            if not _arrow_scalar_ok(b, ftype(pa_)):
                return None
            f = pc.field(pa_)
            return {
                "=": f == b, "<>": f != b, "<": f < b,
                "<=": f <= b, ">": f > b, ">=": f >= b,
            }[op]
        return None

    return compile_node(ast)


def to_column_ranges(filter_expr: "str | dict") -> "dict[str, tuple]":
    """Extract conservative per-column value bounds from a CQL2 filter:
    ``{col: (lo, hi)}`` (either bound None = open, closed intervals)
    IMPLIED by the predicate — a file whose recorded [min, max] misses
    the range can contain no matching row. Feeds the clustered store's
    zone-map file prune (clustered.prune_plan ``column_ranges``).

    Only top-level conjunctions of property-vs-scalar comparisons
    (< <= > >= = , BETWEEN) contribute; OR / NOT / everything else
    contributes nothing (conservative). Strict bounds use the literal
    itself — closed-interval file tests over-keep boundary files, never
    drop a match.
    """
    ast = parse_cql2(filter_expr)
    out: dict[str, list] = {}

    def prop_name(node):
        return (
            node["property"]
            if isinstance(node, dict) and set(node) == {"property"}
            else None
        )

    def narrow(col, lo, hi):
        cur = out.setdefault(col, [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    def walk(node):
        if not isinstance(node, dict):
            return
        op = node.get("op")
        args = node.get("args", [])
        if op == "and":
            for a in args:
                walk(a)
            return
        if op == "between":
            p = prop_name(args[0])
            lo, hi = args[1], args[2]
            if p is not None and _scalar(lo) and _scalar(hi):
                narrow(p, lo, hi)
            return
        if op in ("=", "<", "<=", ">", ">="):
            a, b = args
            pa_, pb = prop_name(a), prop_name(b)
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}
            if pa_ is None and pb is not None:
                a, b, pa_, op = b, a, pb, flip[op]
            if pa_ is None or not _scalar(b):
                return
            if op == "=":
                narrow(pa_, b, b)
            elif op in ("<", "<="):
                narrow(pa_, None, b)
            else:
                narrow(pa_, b, None)

    def _scalar(v):
        return isinstance(v, (int, float, str)) and not isinstance(v, bool)

    walk(ast)
    return {k: (v[0], v[1]) for k, v in out.items()}
