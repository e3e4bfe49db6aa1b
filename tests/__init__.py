# Regular package marker: without this, `import tests.*` can resolve to the
# reference tree's own `tests` package (a regular package anywhere on sys.path
# beats a namespace dir) once ref_torch_loader appends /root/reference.
