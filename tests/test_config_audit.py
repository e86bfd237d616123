"""Dead-flag audit: every Config field must be READ somewhere.

Round-4 verdict found ``test_keep_aspect`` defined but read nowhere — a
product capability hidden behind a flag that did nothing.  This gate makes
that class of bug impossible to reintroduce: each field name must appear
(word-boundary match) in the package source outside config.py, or be on the
explicit allowlist of documented CLI-parity-only flags.

The word-boundary grep can be fooled by an unrelated identifier with the
same name (e.g. a field named like a module) — acceptable: the audit is a
tripwire for the common case (a flag added and forgotten), not a proof of
dataflow.
"""

import dataclasses
import pathlib
import re

from uegan_tpu.config import Config

# documented as accepted-but-unused, kept so reference command lines parse
# (config.py: "kept for CLI parity"); everything else must be read
_CLI_PARITY_ONLY = {"gpu_ids", "parallel"}


def test_every_config_field_is_read_somewhere():
    root = pathlib.Path(__file__).resolve().parents[1]
    src = ""
    for base in ("uegan_tpu", "benchmarks", "tools"):
        d = root / base
        if d.is_dir():
            for p in d.rglob("*.py"):
                if p.name != "config.py":
                    src += p.read_text()
    src += (root / "main.py").read_text()
    src += (root / "__graft_entry__.py").read_text()

    dead = [
        f.name
        for f in dataclasses.fields(Config)
        if f.name not in _CLI_PARITY_ONLY
        and not re.search(r"\b%s\b" % re.escape(f.name), src)
    ]
    assert not dead, (
        f"Config fields defined but never read (dead flags): {dead} — wire "
        f"them or add to the documented CLI-parity allowlist"
    )
