from nebuia_vector_db_spark.multimodal.assets import (  # noqa: F401
    ASSET_META_SCHEMA,
    attach_fake_assets,
    decode_image_features,
    decode_image_real,
    sample_frames,
)
