from .validation import (
    ancient_egyptian_decomposition,
    check_power_of_two,
    exponent,
    is_power_of_two,
    max_level,
    next_power_of_two,
)

__all__ = [
    "ancient_egyptian_decomposition", "check_power_of_two", "exponent",
    "is_power_of_two", "max_level", "next_power_of_two",
]
