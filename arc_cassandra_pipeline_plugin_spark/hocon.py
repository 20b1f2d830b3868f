"""Minimal HOCON-subset reader for pipeline configs.

The reference parses its job files with Typesafe Config — HOCON, a JSON
superset (``CassandraLoadSuite.scala:126`` feeds
``src/it/resources/arc.json`` through ``ArcPipeline.parseConfig``). Real
Arc job files therefore use comments, unquoted keys, ``key = value``,
newline-separated fields, and ``${...}`` substitutions. This module
implements the subset of the public HOCON spec those files rely on:

- ``//`` and ``#`` comments
- optional root braces
- ``:`` or ``=`` separators; the separator may be omitted before ``{``
- commas OR newlines between elements; trailing commas
- quoted strings (JSON escapes), triple-quoted ``\"\"\"`` strings,
  unquoted strings
- numbers / true / false / null typing for unquoted scalars
- whitespace-preserving string value concatenation on one line
  (``${PWD}/data/*.csv``)
- ``${path}`` / ``${?path}`` substitutions, resolved against the document
  first, then the process environment (Typesafe's default resolver order
  for env fallback); unresolvable required substitutions raise, optional
  ones drop the field / resolve to ''
- duplicate keys: objects deep-merge, anything else last-wins
- unquoted dotted keys nest (``a.b.c = 1``); quoted keys never nest
  (``"spark.cassandra.connection.host"`` stays one key)

Deliberately out of scope (unused by the reference's configs): includes,
``+=``, object/array concatenation, multi-line unquoted strings.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Any


class HoconError(ValueError):
    pass


@dataclass(frozen=True)
class _Tok:
    kind: str  # one of: { } [ ] , nl sep str unq subst eof
    val: Any = None
    ws: str = ""  # raw whitespace preceding the token (same line)


_UNQUOTED_END = set('{}[],:=#"\n \t\r')
_NUM_RE = re.compile(r"^[+-]?(\d+(\.\d+)?([eE][+-]?\d+)?)$")


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)
    ws = ""
    while i < n:
        c = text[i]
        if c in " \t\r":
            ws += c
            i += 1
            continue
        if c == "\n":
            toks.append(_Tok("nl"))
            ws = ""
            i += 1
            continue
        if c == "#" or text.startswith("//", i):
            while i < n and text[i] != "\n":
                i += 1
            continue
        if text.startswith('"""', i):
            j = text.find('"""', i + 3)
            if j < 0:
                raise HoconError("unterminated triple-quoted string")
            toks.append(_Tok("str", text[i + 3 : j], ws))
            ws = ""
            i = j + 3
            continue
        if c == '"':
            j = i + 1
            buf = []
            escapes = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    e = text[j + 1]
                    if e == "u":
                        cp = int(text[j + 2 : j + 6], 16)
                        j += 6
                        # JSON encodes astral characters as UTF-16 surrogate
                        # pairs: combine \uD800-\uDBFF with the following low
                        # surrogate escape
                        if 0xD800 <= cp <= 0xDBFF and text.startswith("\\u", j):
                            lo = int(text[j + 2 : j + 6], 16)
                            if 0xDC00 <= lo <= 0xDFFF:
                                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                                j += 6
                        buf.append(chr(cp))
                    else:
                        buf.append(escapes.get(e, e))
                        j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise HoconError("unterminated string")
            toks.append(_Tok("str", "".join(buf), ws))
            ws = ""
            i = j + 1
            continue
        if text.startswith("${", i):
            j = text.find("}", i)
            if j < 0:
                raise HoconError("unterminated substitution")
            body = text[i + 2 : j]
            optional = body.startswith("?")
            toks.append(_Tok("subst", ((body[1:] if optional else body).strip(), optional), ws))
            ws = ""
            i = j + 1
            continue
        if c in "{}[],":
            toks.append(_Tok(c, None, ws))
            ws = ""
            i += 1
            continue
        if c in ":=":
            toks.append(_Tok("sep", None, ws))
            ws = ""
            i += 1
            continue
        # unquoted token
        j = i
        while j < n and text[j] not in _UNQUOTED_END and not text.startswith("//", j) and not text.startswith("${", j):
            j += 1
        toks.append(_Tok("unq", text[i:j], ws))
        ws = ""
        i = j
    toks.append(_Tok("eof"))
    return toks


@dataclass(frozen=True)
class _Subst:
    path: str
    optional: bool


@dataclass(frozen=True)
class _Concat:
    parts: tuple  # str literals and _Subst, in order


def _type_unquoted(s: str) -> Any:
    t = s.strip()
    if t == "true":
        return True
    if t == "false":
        return False
    if t == "null":
        return None
    if _NUM_RE.match(t):
        return json.loads(t) if ("." in t or "e" in t or "E" in t) else int(t)
    return t


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def skip_nl(self) -> None:
        while self.peek().kind == "nl":
            self.next()

    def skip_elem_sep(self) -> None:
        while self.peek().kind in ("nl", ","):
            self.next()

    def parse_root(self) -> dict:
        self.skip_nl()
        if self.peek().kind == "{":
            v = self.parse_object()
            self.skip_elem_sep()
            if self.peek().kind != "eof":
                raise HoconError(f"trailing content after root object")
            return v
        return self.parse_object(braceless=True)

    def parse_object(self, braceless: bool = False) -> dict:
        if not braceless:
            assert self.next().kind == "{"
        out: dict[str, Any] = {}
        while True:
            self.skip_elem_sep()
            k = self.peek().kind
            if k == "}" and not braceless:
                self.next()
                return out
            if k == "eof":
                if braceless:
                    return out
                raise HoconError("unterminated object")
            path = self.parse_key()
            t = self.peek()
            if t.kind == "{":  # separator omitted before nested object
                val = self.parse_object()
            elif t.kind == "sep":
                self.next()
                self.skip_nl()  # HOCON permits the value on the next line
                val = self.parse_value()
            else:
                raise HoconError(f"expected ':'/'='/'{{' after key {'.'.join(path)}")
            _set_path(out, path, val)

    def parse_key(self) -> list[str]:
        t = self.next()
        if t.kind == "str":
            return [t.val]  # quoted keys never nest
        if t.kind == "unq":
            return [p for p in t.val.strip().split(".") if p]
        raise HoconError(f"bad object key token: {t.kind}")

    def parse_array(self) -> list:
        assert self.next().kind == "["
        out = []
        while True:
            self.skip_elem_sep()
            if self.peek().kind == "]":
                self.next()
                return out
            if self.peek().kind == "eof":
                raise HoconError("unterminated array")
            out.append(self.parse_value(in_array=True))

    def parse_value(self, in_array: bool = False) -> Any:
        """One value: atoms concatenated until end-of-element."""
        atoms: list[tuple[_Tok, Any]] = []
        terminators = ("nl", ",", "}", "]", "eof")
        while True:
            t = self.peek()
            if t.kind in terminators:
                break
            if t.kind == "{":
                atoms.append((t, self.parse_object()))
            elif t.kind == "[":
                atoms.append((t, self.parse_array()))
            elif t.kind in ("str", "unq"):
                self.next()
                atoms.append((t, t))
            elif t.kind == "subst":
                self.next()
                atoms.append((t, _Subst(t.val[0], t.val[1])))
            else:
                raise HoconError(f"unexpected token {t.kind} in value")
        if not atoms:
            raise HoconError("empty value")
        if len(atoms) == 1:
            tok, v = atoms[0]
            if isinstance(v, (dict, list, _Subst)):
                return v
            return v.val if tok.kind == "str" else _type_unquoted(v.val)
        # concatenation: scalars + substitutions only, whitespace-preserving
        parts: list[Any] = []
        for idx, (tok, v) in enumerate(atoms):
            if isinstance(v, (dict, list)):
                raise HoconError("object/array concatenation is not supported")
            if idx > 0 and tok.ws:
                parts.append(tok.ws)
            if isinstance(v, _Subst):
                parts.append(v)
            else:
                parts.append(v.val if tok.kind == "str" else v.val.strip())
        return _Concat(tuple(parts))


def _set_path(obj: dict, path: list[str], val: Any) -> None:
    for p in path[:-1]:
        nxt = obj.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            obj[p] = nxt
        obj = nxt
    key = path[-1]
    old = obj.get(key)
    if isinstance(old, dict) and isinstance(val, dict):
        _merge(old, val)  # HOCON: duplicate object keys deep-merge
    else:
        obj[key] = val


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(dst.get(k), dict) and isinstance(v, dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _lookup(root: Any, path: str) -> Any:
    cur = root
    for p in path.split("."):
        if not isinstance(cur, dict) or p not in cur:
            raise KeyError(path)
        cur = cur[p]
    return cur


def _resolve(node: Any, root: dict, seen: tuple = ()) -> Any:
    if isinstance(node, _Subst):
        if node.path in seen:
            raise HoconError(f"substitution cycle at ${{{node.path}}}")
        try:
            tgt = _lookup(root, node.path)
            return _resolve(tgt, root, seen + (node.path,))
        except KeyError:
            pass
        if node.path in os.environ:
            return os.environ[node.path]
        if node.optional:
            return _DROP
        raise HoconError(f"could not resolve substitution ${{{node.path}}}")
    if isinstance(node, _Concat):
        out = []
        for p in node.parts:
            r = _resolve(p, root, seen) if isinstance(p, _Subst) else p
            if r is _DROP:
                continue
            out.append(r if isinstance(r, str) else json.dumps(r))
        return "".join(out)
    if isinstance(node, dict):
        resolved = {}
        for k, v in node.items():
            rv = _resolve(v, root, seen)
            if rv is not _DROP:
                resolved[k] = rv
        return resolved
    if isinstance(node, list):
        return [r for r in (_resolve(v, root, seen) for v in node) if r is not _DROP]
    return node


_DROP = object()


def loads(text: str) -> dict:
    """Parse HOCON text (JSON-superset subset documented above) to a dict
    with all substitutions resolved."""
    raw = _Parser(_tokenize(text)).parse_root()
    return _resolve(raw, raw)
