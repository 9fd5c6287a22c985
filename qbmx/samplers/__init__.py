from qbmx.samplers.api import Sampler, get_sampler
from qbmx.samplers.exact import (
    enumerate_states,
    exact_boltzmann,
    exact_sample,
    solve_linear_qubo,
)
from qbmx.samplers.qpu import QPUSampler
from qbmx.samplers.sa_jax import sa_sample, sa_sample_batch
from qbmx.samplers.gibbs import gibbs_sample_batch
from qbmx.samplers.tempering import pt_sample, pt_sample_batch

__all__ = [
    "Sampler",
    "get_sampler",
    "enumerate_states",
    "exact_boltzmann",
    "exact_sample",
    "solve_linear_qubo",
    "QPUSampler",
    "sa_sample",
    "sa_sample_batch",
    "gibbs_sample_batch",
    "pt_sample",
    "pt_sample_batch",
]
