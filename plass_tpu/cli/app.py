"""Multi-tool CLI shell (reference: lib/mmseqs/src/commons/Application.cpp,
Command.h). Each binary registers visible commands plus shared base tools;
unknown commands get a Levenshtein 'did you mean' hint."""
import sys
import time

from ..utils.log import logger, setup


class Command:
    def __init__(self, name, fn, params_fn, usage, description, hidden=False):
        self.name = name
        self.fn = fn
        self.params_fn = params_fn
        self.usage = usage
        self.description = description
        self.hidden = hidden


def _levenshtein(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _shellcompletion(commands, args):
    """The reference's `shellcompletion` tool (Application.cpp:124-182)."""
    if not args:
        print(" ".join(c.name for c in commands if not c.hidden) + " ")
        return 0
    for c in commands:
        if c.name == args[0]:
            print(" ".join(c.params_fn().flags.keys()) + " ")
            break
    print()
    return 0


def run_app(binary_name, commands, argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(f"usage: {binary_name} <command> [<args>]\n\nCommands:")
        for c in commands:
            if not c.hidden:
                print(f"  {c.name:24s} {c.description}")
        return 0
    if argv[0] in ("version", "--version"):
        from .. import __version__
        print(__version__)
        return 0
    if argv[0] == "shellcompletion":
        # Application.cpp:124-182: no operand -> space-separated visible
        # command names; one operand -> that command's flag names (the
        # contract util/bash-completion.sh consumes)
        return _shellcompletion(commands, argv[1:])
    name = argv[0]
    byname = {c.name: c for c in commands}
    if name not in byname:
        best = min(byname, key=lambda n: _levenshtein(name, n))
        print(f"Invalid command '{name}'.", file=sys.stderr)
        if _levenshtein(name, best) <= max(2, len(name) // 2):
            print(f"Did you mean '{best}'?", file=sys.stderr)
        return 1
    cmd = byname[name]
    space = cmd.params_fn()
    try:
        positional = space.parse_args(argv[1:])
    except ValueError as e:
        print(f"Error: {e}", file=sys.stderr)
        print(f"usage: {binary_name} {cmd.name} {cmd.usage}", file=sys.stderr)
        return 1
    setup(space.values.get("verbosity", 3))
    t0 = time.time()
    try:
        rc = cmd.fn(positional, space)
    except (FileExistsError, FileNotFoundError, ValueError) as e:
        logger.error("Error: %s", e)
        return 1
    dt = time.time() - t0
    h, rem = divmod(int(dt), 3600)
    m, s = divmod(rem, 60)
    logger.info("Time for processing: %dh %dm %ds %dms", h, m, s, int((dt % 1) * 1000))
    return rc or 0
