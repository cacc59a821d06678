"""Fibonacci/multiplication example (reference: examples/fibonacci): the
README guest with stdin [17]; expected answer 85."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zkvm_brainfuck_tpu import ProverClient, setup_logger
from zkvm_brainfuck_tpu.test_artifacts import FIBO_BF
from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache


def main():
    setup_logger()
    enable_compilation_cache()
    client = ProverClient()
    stdin = bytes([17])

    output = client.execute(FIBO_BF, stdin).run()
    print("executed:", list(output))

    pk, vk = client.setup(FIBO_BF)
    proof = client.prove(pk, stdin).run()
    client.verify(proof, vk)
    print("proved and verified; answer:", proof.public_values[0])


if __name__ == "__main__":
    main()
