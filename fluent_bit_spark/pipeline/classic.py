"""Classic-mode (.conf / INI) configuration reader.

Mirrors the reference's classic config format (src/config_format/
flb_cf_fluentbit.c): ``[SECTION]`` headers, indented ``Key Value`` pairs
(first whitespace run splits key from the rest-of-line value, keys
case-insensitive), ``#`` comments, ``@SET var=value`` definitions,
``@INCLUDE pattern`` (glob, relative to the including file), and ``${VAR}``
expansion from the environment plus @SET (flb_cf_fluentbit.c meta commands;
env expansion src/flb_env.c).

The parsed sections are translated into the same dict shape the YAML loader
consumes (`pipeline: {inputs, filters, outputs}`, `parsers:`,
`stream_tasks:`), including the per-plugin mapping from classic repeated
keys to structured rule lists — e.g. filter_grep's repeated ``Regex k p`` /
``Exclude k p`` lines (plugins/filter_grep/grep.c config_map) become
``rules: [["regex", k, p], ...]``, exactly what `_apply_filter` expects.
"""

from __future__ import annotations

import glob as _glob
import os
import re

_VAR = re.compile(r"\$\{([A-Za-z0-9_]+)\}")
_BOOLS = {"true": True, "on": True, "false": False, "off": False}


def _expand(value: str, variables: dict) -> str:
    return _VAR.sub(lambda m: str(variables.get(m.group(1), m.group(0))), value)


def parse_classic(text: str, base_dir: str | None = None, variables: dict | None = None) -> list[tuple[str, list[tuple[str, str]]]]:
    """Parse classic-mode text into ordered (section, [(key, value), ...])
    tuples, with @SET/@INCLUDE/${} handled. Keys lowercased; repeated keys
    preserved in order."""
    variables = dict(variables or {})
    variables = {**os.environ, **variables}
    sections: list[tuple[str, list[tuple[str, str]]]] = []
    current: list[tuple[str, str]] | None = None

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("@"):
            cmd, _, rest = line.partition(" ")
            cmd = cmd[1:].lower()
            rest = rest.strip()
            if cmd == "set":
                var, _, val = rest.partition("=")
                variables[var.strip()] = _expand(val.strip(), variables)
            elif cmd == "include":
                pattern = _expand(rest, variables)
                if not os.path.isabs(pattern) and base_dir:
                    pattern = os.path.join(base_dir, pattern)
                for path in sorted(_glob.glob(pattern)):
                    sections.extend(
                        parse_classic(
                            open(path).read(), os.path.dirname(path), variables
                        )
                    )
            else:
                raise ValueError(f"unknown @{cmd} meta command")
            continue
        if line.startswith("[") and line.endswith("]"):
            current = []
            sections.append((line[1:-1].strip().lower(), current))
            continue
        if current is None:
            raise ValueError(f"key outside a section: {line!r}")
        key, _, value = line.partition(" ")
        current.append((key.lower(), _expand(value.strip(), variables)))
    return sections


def _coerce(v: str):
    return _BOOLS.get(v.lower(), v)


def _plain(pairs: list[tuple[str, str]]) -> dict:
    out: dict = {}
    for k, v in pairs:
        out[k] = _coerce(v)
    return out


def _split(v: str, n: int) -> list[str]:
    return v.split(None, n - 1)


# classic repeated-key -> structured rules, per filter plugin (each cites its
# reference config_map)
def _translate_filter(pairs: list[tuple[str, str]]) -> dict:
    conf: dict = {}
    name = dict(pairs).get("name", "")
    rules: list = []
    conditions: list = []
    records: dict = {}
    for k, v in pairs:
        if name == "grep" and k in ("regex", "exclude"):
            rules.append([k, *_split(v, 2)])  # plugins/filter_grep/grep.c
        elif name == "modify" and k in (
            "set", "add", "remove", "remove_wildcard", "remove_regex",
            "rename", "hard_rename", "copy", "hard_copy",
            "move_to_start", "move_to_end",
        ):
            rules.append([k, *_split(v, 2)])  # plugins/filter_modify/modify.c
        elif name == "modify" and k == "condition":
            conditions.append(_split(v, 3))
        elif name == "rewrite_tag" and k == "rule":
            rules.append(_split(v, 4))  # plugins/filter_rewrite_tag/rewrite_tag.c
        elif name == "record_modifier" and k == "record":
            key, val = _split(v, 2)
            records[key] = val  # plugins/filter_record_modifier
        elif name == "record_modifier" and k in ("remove_key", "allowlist_key", "whitelist_key"):
            tgt = "remove_keys" if k == "remove_key" else "allowlist_keys"
            conf.setdefault(tgt, []).append(v)
        elif name == "type_converter" and k in ("int_key", "uint_key", "float_key", "str_key"):
            # "from_key to_key type" — the loader's 3-tuple (the source-kind
            # prefix is implied by the current column type here)
            rules.append(_split(v, 3))  # plugins/filter_type_converter
        elif name == "expect" and k in (
            "key_exists", "key_not_exists", "key_val_is_null",
            "key_val_is_not_null", "key_val_eq", "key_val_does_not_eq",
        ):
            rules.append([k, *_split(v, 2)])  # plugins/filter_expect/expect.c
        elif name == "nest" and k == "wildcard":
            conf.setdefault("wildcard", []).append(v)
        elif name == "parser" and k == "parser":
            conf.setdefault("parser", []).append(v)
        elif name == "throttle" and k == "rate":
            conf["rate"] = v
        else:
            conf[k] = _coerce(v)
    if rules:
        conf["rules"] = rules
    if conditions:
        conf["conditions"] = conditions
    if records:
        conf["records"] = records
    if name == "parser" and isinstance(conf.get("parser"), list) and len(conf["parser"]) == 1:
        conf["parser"] = conf["parser"][0]
    if name == "nest" and isinstance(conf.get("wildcard"), list) and len(conf["wildcard"]) == 1:
        conf["wildcard"] = conf["wildcard"][0]
    return conf


def _translate_parser(pairs: list[tuple[str, str]]) -> dict:
    # [PARSER] sections (parsers.conf): Name/Format/Regex/Time_Key/
    # Time_Format/Types/Decode_Field_As (src/flb_parser.c:800+ config load)
    conf: dict = {}
    types: dict = {}
    for k, v in pairs:
        if k == "fields":
            # engine extension: dynamic-key parsers (logfmt/ltsv/json) need
            # a static field list for the columnar schema
            conf["fields"] = v.split()
        elif k == "types":
            # "a:integer b:float" pairs
            for part in v.split():
                key, _, ty = part.partition(":")
                types[key] = ty
        elif k in ("decode_field", "decode_field_as"):
            conf.setdefault("decoders", []).append(_split(v, 3))
        else:
            conf[k] = _coerce(v)
    if types:
        conf["types"] = types
    return conf


def _translate_multiline_parser(pairs: list[tuple[str, str]]) -> dict:
    # [MULTILINE_PARSER] sections (flb_ml_rule.c + flb_ml_parser.c): repeated
    # quoted `rule "state" "/regex/" "next"` lines become an ordered rule
    # table; regexes keep fluent-bit's /.../-delimited form stripped.
    import shlex

    conf: dict = {}
    rules: list = []
    for k, v in pairs:
        if k == "rule":
            parts = shlex.split(v)
            if len(parts) != 3:
                raise ValueError(f"multiline rule needs 3 quoted parts: {v!r}")
            state, regex, to_state = parts
            if regex.startswith("/") and regex.endswith("/") and len(regex) > 1:
                regex = regex[1:-1]
            rules.append([state, regex, to_state])
        else:
            conf[k] = _coerce(v)
    if rules:
        conf["rules"] = rules
    return conf


def classic_to_dict(text: str, base_dir: str | None = None) -> dict:
    """Translate classic-mode config text into the YAML-loader dict."""
    sections = parse_classic(text, base_dir)
    out: dict = {"pipeline": {"inputs": [], "filters": [], "outputs": []}}
    for section, pairs in sections:
        if section == "service":
            out["service"] = _plain(pairs)
        elif section == "input":
            out["pipeline"]["inputs"].append(_plain(pairs))
        elif section == "filter":
            out["pipeline"]["filters"].append(_translate_filter(pairs))
        elif section == "output":
            out["pipeline"]["outputs"].append(_plain(pairs))
        elif section == "parser":
            out.setdefault("parsers", []).append(_translate_parser(pairs))
        elif section == "multiline_parser":
            out.setdefault("multiline_parsers", []).append(
                _translate_multiline_parser(pairs)
            )
        elif section == "stream_task":
            out.setdefault("stream_tasks", []).append(_plain(pairs))
        else:
            out.setdefault(section, []).append(_plain(pairs))
    return out
