from . import words
from .words import (add, bubble_sort, compare_swap, full_adder, int_decrypt,
                    int_encrypt, less_than, minimum, mux_word,
                    ones_complement, subtract)
