"""GIS layer: raster post-processing, vectorization, parcel homogenization.

Host-side (numpy/scipy) re-design of /root/reference/src/helpers/postprocess.py
and the raster utilities in sentinel2raster.py. Raster-space operations
(vectorize, soften, homogenize, boundary instance splitting) are implemented
in pure numpy/scipy and fully tested; file-format/vector-IO tails (GeoTIFF,
shapefile, CRS reprojection) degrade gracefully when rasterio/geopandas/
pyproj are absent from the image (they are not baked in).
"""
from crop2seg_tpu.gis.postprocess import (
    polygonize, soften_by_segments, homogenize_raster, homogenize_boundaries,
    prediction_to_arrays,
)
from crop2seg_tpu.gis.raster import Affine, GeoRef, save_prediction_raster
