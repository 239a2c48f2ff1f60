"""The README demo — equivalent of the reference's examples/test.c.

Prints the text and the golden match line:
    6:he 5:she 6:hers 12:he 21:his 38:he 37:she 56:he 56:hers
(1-based start positions, shortest match first at each end position).

Run: python examples/demo.py
"""

import sys

sys.path.insert(0, ".")

import aho_corasick_1975_tpu as ac


def main():
    machine = ac.acm_create()
    state = ac.acm_initiate(machine)
    for word in ["he", "she", "his", "hers"]:
        for ch in word:
            ac.acm_insert_letter_of_keyword(state, ch)
        ac.acm_insert_end_of_keyword(state)

    text = "To ushers: he found his pencil, but she could not find hers."
    print(text)
    matcher = ac.acm_matcher_init()
    cst = ac.acm_initiate(machine)
    line = []
    for i, ch in enumerate(text):
        for j in range(ac.acm_match(cst, ch), 0, -1):
            ac.acm_get_match(cst, j - 1, matcher)
            line.append(f" {i + 2 - matcher[0].length}:{matcher[0].text()}")
    print("".join(line))
    ac.acm_matcher_release(matcher)
    ac.acm_release(machine)


if __name__ == "__main__":
    main()
