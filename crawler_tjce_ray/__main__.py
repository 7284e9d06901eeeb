from crawler_tjce_ray.cli import main

raise SystemExit(main())
