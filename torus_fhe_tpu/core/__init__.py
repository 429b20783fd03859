from . import params, rng, torus
