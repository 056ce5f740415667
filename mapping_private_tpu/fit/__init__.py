from mapping_private_tpu.fit.ransac import (
    fit_plane_ransac,
    fit_line2d_ransac,
    fit_circle2d_ransac,
    sample_live_indices,
    score_hypotheses,
)
from mapping_private_tpu.fit.cylinder import (
    Cylinder,
    fit_cylinder_ransac,
    cylinder_mesh,
    point_to_axis_distance,
)
from mapping_private_tpu.fit.box import (
    OrientedBox,
    fit_box_zup,
    fit_box_pca,
    box_mesh,
)
from mapping_private_tpu.fit.rotational import (
    RotationalSurface,
    fit_rotational_ransac,
    rotational_distance,
)
from mapping_private_tpu.fit.orientation import fit_orientation_ransac

__all__ = [
    "fit_plane_ransac",
    "fit_line2d_ransac",
    "fit_circle2d_ransac",
    "sample_live_indices",
    "score_hypotheses",
    "Cylinder",
    "fit_cylinder_ransac",
    "cylinder_mesh",
    "point_to_axis_distance",
    "OrientedBox",
    "fit_box_zup",
    "fit_box_pca",
    "box_mesh",
    "RotationalSurface",
    "fit_rotational_ransac",
    "rotational_distance",
    "fit_orientation_ransac",
]
