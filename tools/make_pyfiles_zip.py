"""Build dist/nexus_forge_spark.zip for spark-submit --py-files."""
import os
import zipfile

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(root, "dist"), exist_ok=True)
out = os.path.join(root, "dist", "nexus_forge_spark.zip")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for dirpath, _dirnames, filenames in os.walk(os.path.join(root, "nexus_forge_spark")):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, root))
print(out)
