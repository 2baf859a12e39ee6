"""Demo applications (L6): generation, interpolation, retargeting."""
