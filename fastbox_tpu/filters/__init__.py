"""Foreground-cleaning filters (reference fastbox/filters.py), native JAX.

PCA/ICA/NMF/kernel-PCA run on device (the reference delegates to
sklearn's Cython); GPR and least-squares component fitting are jax
implementations of the GPy / lmfit+multiprocessing paths.
"""
from .bandpass import angular_bandpass_filter, bandpower_pca_filter
from .gpr import KernelSpec, gpr_filter
from .ica import fastica, ica_filter
from .kpca import kernel_pca_filter, kernel_pca_filter_legacy
from .lsq import LSQfitting, lsq_synchrotron_fit
from .nmf import nmf, nmf_filter
from .pca import mean_spectrum_filter, pca_filter, pca_filter_subspace

__all__ = [
    "angular_bandpass_filter",
    "bandpower_pca_filter",
    "fastica",
    "gpr_filter",
    "KernelSpec",
    "ica_filter",
    "kernel_pca_filter",
    "kernel_pca_filter_legacy",
    "LSQfitting",
    "lsq_synchrotron_fit",
    "nmf",
    "nmf_filter",
    "mean_spectrum_filter",
    "pca_filter",
    "pca_filter_subspace",
]
