"""Operator kernels — one module per reference ``feature_type``.

Each kernel is a function from input Column(s) + config to an output
Column (or a small DataFrame stage), mirroring the factory surface of
``fg_lite/feature/FeatureFunctionCreator.cpp:140-223``:

  id_feature          operators.id_feature
  raw_feature         operators.raw_feature
  combo_feature       operators.combo_feature
  lookup_feature      operators.lookup_feature  (k:v map form, V1)
  lookup_feature[]    operators.lookup_array    (map_keys/map_values arrays,
                                                 timediff / gap / count —
                                                 the point-in-time kernel)
  lookup_feature_v2/3 operators.lookup_encoded  (MapType form; byte codecs
                                                 are physical-only, not ported)
  match_feature       operators.match_feature
  overlap_feature     operators.overlap_feature
  kgb_match_semantic  operators.kgb_match
  preclick_urb_word   operators.preclick_urb
"""
