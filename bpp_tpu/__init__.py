"""bpp_tpu — a TPU-native Bayesian multispecies-coalescent MCMC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of BPP
(Flouri, Rannala & Yang; reference layout surveyed in SURVEY.md):
Bayesian inference of species trees, species delimitation, introgression
and migration under the multispecies coalescent, driven by MCMC over
per-locus gene trees with Felsenstein-pruning likelihoods.

Design stance (TPU-first, see SURVEY.md §7):
  * gene trees and species trees are fixed-shape index arrays, not
    pointer structures;
  * the likelihood engine is a batched, age-ordered pruning scan over
    ``[loci, sites, cats, states]`` tensors;
  * MCMC moves are pure jitted functions ``(state, key) -> state``;
  * loci shard across a ``jax.sharding.Mesh``; cross-locus scalar terms
    reduce with ``psum`` instead of the reference's pthread fork-join.
"""

__version__ = "0.1.0"
