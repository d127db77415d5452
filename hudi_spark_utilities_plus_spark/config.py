"""Properties/config resolution + option-namespace routing.

Reference parity (A14/A15): every importer resolves a ``TypedProperties``
from (a) explicit properties, (b) a ``--props`` file, (c) ``--hoodie-conf
k=v`` CLI overrides — overrides win (``HoodieExcelImporter.scala:45-57``).
Reader extra options are forwarded from the prefix namespace
``hoodie.deltastreamer.<source>.extra.options.`` with the prefix stripped
(``HoodieExcelImporter.scala:68-82``; same block in all importers).
"""

from __future__ import annotations

import os


def parse_properties(text: str) -> dict[str, str]:
    """Minimal .properties parser: k=v lines, #/! comments, trimmed."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" in line:
            k, _, v = line.partition("=")
        elif ":" in line:
            k, _, v = line.partition(":")
        else:
            continue
        out[k.strip()] = v.strip()
    return out


def load_properties_file(path: str) -> dict[str, str]:
    with open(path) as f:
        return parse_properties(f.read())


def resolve_props(
    explicit: dict[str, str] | None = None,
    props_file: str | None = None,
    cli_overrides: list[str] | None = None,
) -> dict[str, str]:
    """Merge with the reference's precedence: explicit < file < CLI."""
    props: dict[str, str] = dict(explicit or {})
    if props_file:
        if not os.path.exists(props_file):
            raise FileNotFoundError(f"--props file not found: {props_file}")
        props.update(load_properties_file(props_file))
    for kv in cli_overrides or []:
        if "=" not in kv:
            raise ValueError(f"--hoodie-conf expects k=v, got: {kv}")
        k, _, v = kv.partition("=")
        props[k.strip()] = v.strip()
    return props


def prefix_options(props: dict[str, str], prefix: str) -> dict[str, str]:
    """All options under ``prefix``, prefix stripped — the reader
    extra-options router (addExtraOptions)."""
    return {
        k[len(prefix) :]: v
        for k, v in props.items()
        if k.startswith(prefix) and len(k) > len(prefix)
    }


def extra_options(props: dict[str, str], source: str) -> dict[str, str]:
    """``hoodie.deltastreamer.<source>.extra.options.*`` → reader options."""
    return prefix_options(props, f"hoodie.deltastreamer.{source}.extra.options.")


def require(props: dict[str, str], *keys: str) -> None:
    missing = [k for k in keys if not props.get(k)]
    if missing:
        raise ValueError(f"missing required properties: {missing}")
