from mapping_private_tpu.recognition.pca import (
    PCAResult,
    pca_fit,
    subspace_axis,
    read_pca,
    variance_report,
    write_pca,
)
from mapping_private_tpu.recognition.search import (
    SceneData,
    Detection,
    build_scene_data,
    search_object,
    search_objects_multi,
)

__all__ = [
    "PCAResult",
    "pca_fit",
    "subspace_axis",
    "read_pca",
    "variance_report",
    "write_pca",
    "SceneData",
    "Detection",
    "build_scene_data",
    "search_object",
    "search_objects_multi",
]
