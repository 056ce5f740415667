from mapping_private_tpu.models.table_detector import (
    TableDetectorConfig,
    TableDetection,
    detect_table,
)
from mapping_private_tpu.models.table_memory import (
    TableMemory,
    Table,
    TableObject,
    TableStateInstance,
)
from mapping_private_tpu.models.hough_segmentation import (
    HoughConfig,
    HoughSegment,
    hough_segment,
)
from mapping_private_tpu.models.room_segmentation import (
    RoomSegmentationConfig,
    RoomSegmentation,
    segment_room,
    wall_filter,
)

__all__ = [
    "TableDetectorConfig",
    "TableDetection",
    "detect_table",
    "TableMemory",
    "Table",
    "TableObject",
    "TableStateInstance",
    "HoughConfig",
    "HoughSegment",
    "hough_segment",
    "RoomSegmentationConfig",
    "RoomSegmentation",
    "segment_room",
    "wall_filter",
]
