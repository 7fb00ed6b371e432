"""Device-side compute ops: geometry, triangulation, heatmaps, uncertainty,
coreset selection, image transforms, and Pallas kernels."""
