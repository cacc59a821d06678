"""Guest program fixtures (reference: crates/test-artifacts/guests/*.bf)."""

# Reads n, prints fib-style multiply/add result (README's multiplication demo):
FIBO_BF = ",>+>+<<[->>[->+>+<<]<[->>+<<]>>[-<+>]>[-<<<+>>>]<<<<]>>."

HELLO_BF = (
    ">++++++++[<+++++++++>-]<.>++++[<+++++++>-]<+.+++++++..+++."
    ">>++++++[<+++++++>-]<+"
)

MOVE_BF = ">>>>++.<<<<."

LOOP_BF = "+++++[-]."

PRINTA_BF = """+++++ +++++
+++++ +++++
+++++ +++++
+++++ +++++
+++++ +++++
+++++ +++++
+++++
."""

ALL = {
    "fibo": FIBO_BF,
    "hello": HELLO_BF,
    "move": MOVE_BF,
    "loop": LOOP_BF,
    "printa": PRINTA_BF,
}
