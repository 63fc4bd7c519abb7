"""Golden-output regression tests: the fully deterministic scripts must
produce byte-identical output (captured under tests/golden/)."""
import os

import pytest

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "golden")
EXAMPLES = os.path.join(HERE, "..", "examples")


@pytest.mark.parametrize("name", ["t4_22a", "t4_30a", "t4_30b", "t4_30c"])
def test_golden(t4, name):
    if os.environ.get("T4_TEST_TPU") == "1" and name == "t4_30c":
        pytest.skip("byte-exact backprop print is CPU-pinned (TPU "
                    "sigmoid differs by 1 ulp; 1e-5 parity covered by "
                    "test_nn/test_oracle tolerance tests)")
    with open(os.path.join(GOLDEN, f"{name}.out")) as f:
        want = f.read()
    got = []
    with open(os.path.join(EXAMPLES, f"{name}.4th")) as f:
        for line in f:
            got.append(t4.forth(line.rstrip("\n")))
            from tensorforth_tpu.vm.vm import VMState
            if t4.vm.state == VMState.STOP:
                break
    assert "".join(got) == want
