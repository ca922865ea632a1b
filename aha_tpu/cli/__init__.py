"""Command-line interface: `python -m aha_tpu.cli <command> ...`.

Replaces the reference's per-task entry points
(`python -m test.inference` / `test.grid_search` / `test.evaluate` /
`test.highlight_generator` / `train.py` driven by `scripts/*.sh`) with one
dispatcher. Flag names mirror `LiveTestArguments` / `LiveTrainingArguments`
(`/root/reference/models/arguments_live.py:5-83`) so reference run scripts
port mechanically.

One module per command family (the round-4 engine split applied to the
CLI): `_session.py` holds session construction + the shared inference
flag set; `infer.py` / `evaluate.py` / `train.py` / `serve.py` hold the
subcommands. Everything remains importable as `from aha_tpu.cli import
cmd_train, ...` — the public surface is unchanged.
"""

from __future__ import annotations

import sys

from aha_tpu.cli._session import (  # noqa: F401  (public compat surface)
    _add_infer_flags,
    _adopt_checkpoint_config,
    _build_session,
    _resolve_params_file,
)
from aha_tpu.cli.evaluate import (  # noqa: F401
    cmd_evaluate,
    cmd_grid_search,
    cmd_highlight,
    cmd_visualize,
)
from aha_tpu.cli.infer import cmd_demo, cmd_infer  # noqa: F401
from aha_tpu.cli.serve import cmd_serve  # noqa: F401
from aha_tpu.cli.train import cmd_train  # noqa: F401

COMMANDS = {
    "infer": cmd_infer,
    "grid-search": cmd_grid_search,
    "evaluate": cmd_evaluate,
    "highlight": cmd_highlight,
    "demo": cmd_demo,
    "train": cmd_train,
    "visualize": cmd_visualize,
    "serve": cmd_serve,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m aha_tpu.cli {" + ",".join(COMMANDS) + "} ...")
        return 0
    # persistent XLA compilation cache: the 3-stage eval pipelines spawn a
    # fresh process per stage and the 7B compile costs minutes each —
    # cache it once on disk (AHA_COMPILE_CACHE=0 to disable)
    from aha_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd}; available: {', '.join(COMMANDS)}")
        return 2
    COMMANDS[cmd](argv[1:])
    return 0
