"""Byte-parity tests for filterdb --filter-expression against the reference
binary's tinyexpr-backed EXPRESSION_FILTERING (filterdb.cpp:207-255,326-341),
plus unit tests of the expression evaluator itself."""
import math
import os
import subprocess

import pytest

pytestmark = pytest.mark.smoke

from plass_tpu.data import seqdb
from plass_tpu.utils.expr import ExprError, Expression

REF = "/tmp/refbuild/src/plass"
OURS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "bin", "plass")

needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference binary not built")


def ev(text, **cols):
    e = Expression(text)
    for k, v in cols.items():
        e.bind(int(k[1:]) - 1, v)
    return e.evaluate()


class TestExpression:
    def test_arithmetic(self):
        assert ev("1+2*3") == 7
        assert ev("(1+2)*3") == 9
        assert ev("2^3^2") == 64  # left-assoc (TE_POW_FROM_RIGHT off)
        assert ev("10%3") == 1
        assert ev("-4+1") == -3

    def test_comparisons_logical(self):
        assert ev("3>2") == 1.0
        assert ev("2>=2 && 1<2") == 1.0
        assert ev("1>2 || 3!=3") == 0.0
        assert ev("!0") == 1.0
        assert ev("!5") == 0.0
        assert ev("2==2") == 1.0

    def test_functions(self):
        assert ev("sqrt(16)") == 4
        assert abs(ev("log(100)") - 2.0) < 1e-12  # log = log10
        assert abs(ev("ln(e)") - 1.0) < 1e-12
        assert ev("pow(2,10)") == 1024
        assert ev("abs(0-3)") == 3
        assert ev("ncr(5,2)") == 10
        assert ev("fac(5)") == 120
        assert abs(ev("atan2(1,1)") - math.pi / 4) < 1e-12

    def test_variables(self):
        assert ev("$1>$2", **{"$1": 3.0, "$2": 1.0}) == 1.0
        assert Expression("$3+$1").bindable == [0, 2]

    def test_errors(self):
        for bad in ("1+", "foo(1)", "$x", "(1", "1 2"):
            with pytest.raises(ExprError):
                Expression(bad)

    def test_stale_binding(self):
        e = Expression("$1")
        e.bind(0, 7.0)
        assert e.evaluate() == 7.0
        # no rebind: previous value persists like the reference's
        # variables[] member array
        assert e.evaluate() == 7.0


@pytest.fixture()
def resultdb(tmp_path):
    w = seqdb.DBWriter(seqdb.GENERIC_DB)
    rows = {
        0: "10\t250\t0.99\t1e-30\n11\t80\t0.45\t0.5\n12\t130\t0.70\t1e-5\n",
        1: "13\t60\t0.30\t1.0\n",
        2: "14\t300\t1.00\t0\n15\t90\t0.52\t2e-3\n16\t10\t0.05\t10\n",
    }
    for k, body in rows.items():
        w.write(k, body.encode(), add_newline=False)
    p = str(tmp_path / "res")
    w.finish().save(p)
    return p


@needs_ref
@pytest.mark.parametrize("expr", [
    "$2>100",
    "$3>=0.5 && $4<1e-2",
    "($2+$1)>100 || $3==1.0",
    "log($2)>2",
    "!($3<0.5)",
])
def test_filter_expression_parity(resultdb, tmp_path, expr):
    ref_out = str(tmp_path / "ref")
    our_out = str(tmp_path / "ours")
    # --threads 1: with >1 threads the reference leaves unmerged .0/.1
    # shards on tiny DBs, and byte parity presumes single-writer order
    subprocess.run([REF, "filterdb", resultdb, ref_out,
                    "--filter-expression", expr, "-v", "0",
                    "--threads", "1"],
                   check=True, capture_output=True)
    subprocess.run([OURS, "filterdb", resultdb, our_out,
                    "--filter-expression", expr],
                   check=True, capture_output=True)
    for suf in ("", ".index"):
        with open(ref_out + suf, "rb") as f:
            ref_b = f.read()
        with open(our_out + suf, "rb") as f:
            our_b = f.read()
        assert ref_b == our_b, f"{suf or 'data'} mismatch for {expr!r}"
