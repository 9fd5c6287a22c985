from qbmx.core.qubo import (
    split_qubo,
    qubo_energy,
    qubo_energies,
    default_beta_range,
    geometric_beta_schedule,
)

__all__ = [
    "split_qubo",
    "qubo_energy",
    "qubo_energies",
    "default_beta_range",
    "geometric_beta_schedule",
]
