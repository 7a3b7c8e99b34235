"""Minimal hjson reader for DictionaryMapping rule files.

The reference parses mapping rules with the ``hjson`` package
(kgforge/specializations/mappings/dictionaries.py:31-48); that package is not
available here, so this is a small from-scratch reader for the subset the
fixture mappings actually use (public hjson syntax:
https://hjson.github.io/syntax.html):

* objects ``{ }`` / arrays ``[ ]`` spanning lines, optional commas
* unquoted keys, quoted or unquoted string values (unquoted runs to EOL)
* full-line ``#`` / ``//`` comments
* JSON numbers / true / false / null
* key order preserved (rule order == output struct field order)

Rule *expressions* (``x.a``, ``forge.format(...)``, f-strings) stay raw
strings — compiling them is operators/mapping.py's job.
"""

from __future__ import annotations

import json
import re


class HjsonError(ValueError):
    pass


_COMMENT = re.compile(r"^\s*(#|//)")
_NUMBER = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


class _Cursor:
    def __init__(self, text: str):
        self.lines: list[str] = []
        for raw in text.splitlines():
            if _COMMENT.match(raw):
                continue
            if raw.strip():
                self.lines.append(raw.strip())
        self.pos = 0

    def peek(self) -> str:
        if self.pos >= len(self.lines):
            raise HjsonError("unexpected end of document")
        return self.lines[self.pos]

    def next(self) -> str:
        line = self.peek()
        self.pos += 1
        return line

    def pushback(self, line: str) -> None:
        self.lines.insert(self.pos, line)

    @property
    def done(self) -> bool:
        return self.pos >= len(self.lines)


def loads(text: str):
    cur = _Cursor(text)
    if cur.done:
        raise HjsonError("empty document")
    val = _parse_value(cur)
    if not cur.done:
        raise HjsonError(f"trailing content: {cur.peek()!r}")
    return val


def load(path: str):
    with open(path, encoding="utf-8") as f:
        return loads(f.read())


def _parse_value(cur: _Cursor):
    line = cur.peek()
    if line.startswith("{"):
        return _parse_object(cur)
    if line.startswith("["):
        return _parse_array(cur)
    return _scalar(cur.next().rstrip(","))


def _parse_object(cur: _Cursor):
    line = cur.next()
    if line in ("{}", "{},"):
        return {}
    if line != "{" and line.endswith(("}", "},")):
        return _parse_inline_json(line)
    if line != "{":
        raise HjsonError(f"bad object start: {line!r}")
    obj: dict = {}
    while True:
        line = cur.next()
        if line in ("}", "},"):
            return obj
        key, rest = _split_key(line)
        rest = rest.strip()
        if rest == "":
            obj[key] = _parse_value(cur)  # value on following line(s)
        elif rest in ("{", "["):
            cur.pushback(rest)
            obj[key] = _parse_value(cur)
        else:
            obj[key] = _scalar(rest.rstrip(","))


def _parse_array(cur: _Cursor):
    line = cur.next()
    if line in ("[]", "[],"):
        return []
    if line != "[" and line.endswith(("]", "],")):
        return _parse_inline_json(line)
    if line != "[":
        raise HjsonError(f"bad array start: {line!r}")
    arr: list = []
    while True:
        if cur.peek() in ("]", "],"):
            cur.next()
            return arr
        arr.append(_parse_value(cur))


def _split_key(line: str) -> tuple[str, str]:
    if line.startswith('"'):
        m = re.match(r'^"((?:[^"\\]|\\.)*)"\s*:(.*)$', line)
        if not m:
            raise HjsonError(f"bad quoted key: {line!r}")
        return json.loads(f'"{m.group(1)}"'), m.group(2)
    idx = line.find(":")
    if idx < 0:
        raise HjsonError(f"missing ':' in {line!r}")
    return line[:idx].strip(), line[idx + 1:]


def _parse_inline_json(line: str):
    try:
        return json.loads(line.rstrip(","))
    except json.JSONDecodeError as e:
        raise HjsonError(f"unsupported inline value: {line!r}") from e


def _scalar(token: str):
    t = token.strip()
    if t.startswith('"') and t.endswith('"') and len(t) >= 2:
        try:
            return json.loads(t)
        except json.JSONDecodeError:
            return t[1:-1]
    if t == "true":
        return True
    if t == "false":
        return False
    if t == "null":
        return None
    if _NUMBER.match(t):
        return float(t) if ("." in t or "e" in t or "E" in t) else int(t)
    return t
