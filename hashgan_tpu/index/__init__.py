from hashgan_tpu.index.gallery import PackedGallery, build_gallery  # noqa: F401
from hashgan_tpu.index.engine import (  # noqa: F401
    QueryEngine,
    QueryResult,
    ServingPipeline,
)
from hashgan_tpu.index.server import (  # noqa: F401
    GalleryService,
    make_server,
    serve_forever,
)
