"""CLI shell surface: shellcompletion (Application.cpp:124-182) emits the
registered command names and per-command flag names for both binaries."""
import pytest

pytestmark = pytest.mark.smoke


def test_shellcompletion_commands(capsys):
    from plass_tpu.cli.app import run_app
    from plass_tpu.cli import plass as plass_cli

    rc = run_app("plass", plass_cli.commands(), ["shellcompletion"])
    assert rc == 0
    out = capsys.readouterr().out.split()
    assert "assemble" in out
    # only VISIBLE commands, like the reference (hidden tools excluded)
    assert "assembleresults" not in out


def test_shellcompletion_flags(capsys):
    from plass_tpu.cli.app import run_app
    from plass_tpu.cli import penguin as penguin_cli

    rc = run_app("penguin", penguin_cli.commands(),
                 ["shellcompletion", "nuclassemble"])
    assert rc == 0
    out = capsys.readouterr().out.split()
    assert "--min-contig-len" in out
    assert "--num-iterations" in out

    # unknown command: empty flag line, still exit 0 (reference behavior)
    rc = run_app("penguin", penguin_cli.commands(),
                 ["shellcompletion", "nosuchcmd"])
    assert rc == 0
