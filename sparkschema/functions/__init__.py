"""Engine kernels: deterministic image codec (raw-RGB + bounded-loss),
PSNR, and text hashing primitives used by the operators."""
