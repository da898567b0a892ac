from hashgan_tpu.index.gallery import PackedGallery, build_gallery  # noqa: F401
