"""Compute kernels: projection, binning, compositing, KNN, SSIM, SH."""
