from mapping_private_tpu.features.colorchlac import (
    calc_auto_threshold,
    calc_scene_auto_threshold,
    colorchlac117,
    colorchlac981,
    colorchlac117_subdiv,
    colorchlac981_subdiv,
    occupied_count_subdiv,
    rgb_voxel_histograms,
    rotate_feature_981,
)
from mapping_private_tpu.features.rsd import (
    rsd_radii,
    get_type,
    grsd20_from_types,
    grsd325_from_types,
    plus_grsd110_from_types,
    vosch,
)
from mapping_private_tpu.features.pfh import pfh_histograms, pair_features
from mapping_private_tpu.features.hlac2d import hlac_bin, hlac_gray, hlac_color
from mapping_private_tpu.features.extract import (
    extract_grsd_cchlac,
    extract_colorchlac117,
    extract_colorchlac981,
    voxelize_for_features,
    voxel_types,
)

__all__ = [
    "calc_auto_threshold",
    "calc_scene_auto_threshold",
    "rgb_voxel_histograms",
    "colorchlac117",
    "colorchlac981",
    "colorchlac117_subdiv",
    "colorchlac981_subdiv",
    "occupied_count_subdiv",
    "rotate_feature_981",
    "rsd_radii",
    "get_type",
    "grsd20_from_types",
    "grsd325_from_types",
    "plus_grsd110_from_types",
    "vosch",
    "pfh_histograms",
    "pair_features",
    "hlac_bin",
    "hlac_gray",
    "hlac_color",
    "extract_grsd_cchlac",
    "extract_colorchlac117",
    "extract_colorchlac981",
    "voxelize_for_features",
    "voxel_types",
]
