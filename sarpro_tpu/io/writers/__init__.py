"""Output writers: GeoTIFF, JPEG, world/prj files, metadata embed/sidecars
(reference: src/io/writers/)."""
