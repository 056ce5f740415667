"""mapping_private_tpu — a TPU-native point-cloud mapping & perception engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
TUM-IAS `mapping-private` ROS stack (tabletop perception, RANSAC shape
fitting, ICP registration, C3-HLAC/GRSD voxel features, subspace object
detection, Hough segmentation, semantic table memory), built TPU-first:

- dense struct-of-array point/voxel tensors resident in HBM
  (replaces `sensor_msgs::PointCloud` named channels),
- batched grid-hash neighbor gathers (replaces `cloud_kdtree::KdTreeANN`),
- vmapped hypothesis RANSAC (replaces serial `sample_consensus` loops),
- jit-compiled pipelines over a host-side DAG (replaces ROS pub/sub),
- `jax.sharding.Mesh` + collectives for multi-chip scaling (replaces
  nothing in the reference — it was single-machine; this is the new
  scaling dimension per BASELINE.json).

Subpackages
-----------
core          typed arrays: PointCloud, VoxelGrid, SE3 poses
io            PCD reader/writer (old COLUMNS and v.5+ FIELDS formats)
ops           kernels: voxel downsample, kNN/radius neighbors, normals,
              clustering, noise removal, region growing, integral tables
fit           vmapped RANSAC/MSAC models + Gauss-Newton/LM refinement
features      C3-HLAC, RSD, GRSD, VOSCH, PFH, 2D HLAC, PCA subspaces, SVM
registration  point-to-plane ICP, scan-to-map, pose-graph optimization
parallel      mesh/sharding helpers, distributed Gauss-Newton
pipeline      typed config, DAG runner, TableMemory world model
models        end-user detectors: table detector, sliding-box detector,
              Hough segmentation, object classification
utils         profiling, metrics, checkpointing
"""

__version__ = "0.1.0"

# Metric geometry needs exact f32 products: TPU's default matmul runs bf16
# MXU passes whose ~1e-3 absolute error poisons pose composition (4×4),
# Rodrigues terms (W@W), and GN systems — measured as a 1.2 mm ICP
# convergence floor that vanishes at HIGHEST.  Hot paths that can tolerate
# bf16 opt back in explicitly with precision=DEFAULT at the call site.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
