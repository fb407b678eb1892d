"""Pure-function compute kernels: box math, focal losses, Hungarian
assignment, attention (Pallas + XLA fallback), deformable sampling."""
