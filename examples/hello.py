"""Hello example (reference: examples/hello/src/main.rs): prove + verify the
hello guest and print its output."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zkvm_brainfuck_tpu import ProverClient, setup_logger
from zkvm_brainfuck_tpu.test_artifacts import HELLO_BF
from zkvm_brainfuck_tpu.utils.jax_setup import enable_compilation_cache


def main():
    setup_logger()
    enable_compilation_cache()
    client = ProverClient()
    pk, vk = client.setup(HELLO_BF)
    proof = client.prove(pk).run()
    client.verify(proof, vk)
    print("output:", proof.public_values.decode())


if __name__ == "__main__":
    main()
