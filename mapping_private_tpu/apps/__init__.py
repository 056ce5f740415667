"""Application entry points (the reference's L6: test/ executables, demo
scripts, and launch pipelines re-exposed as Python CLIs).

  python -m mapping_private_tpu.apps.table_pipeline scene1.pcd scene2.pcd
  python -m mapping_private_tpu.apps.hough_segment scene.pcd
  python -m mapping_private_tpu.apps.icp_register a.pcd b.pcd
  python -m mapping_private_tpu.apps.classify learn|rate --data-dir ...
  python -m mapping_private_tpu.apps.detect_object learn|detect ...
"""
